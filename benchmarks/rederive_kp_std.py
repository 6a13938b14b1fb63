"""Re-derive round-4's exploded gen_kp_std on the surviving 1.2k-step kp
checkpoint, ON CPU, for raw params vs each EMA shadow (VERDICT r4 item 2:
confirm the immature-shadow diagnosis).  Writes
benchmarks/results/kp_std_rederive.json."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")   # sitecustomize preloads the tunnel

import jax.numpy as jnp
import numpy as np

from benchmarks.convergence_campaign import EXPS, CATEGORIES, _latest_ckpt
from slide_tpu.configs import keypoint_ddpm_config
from slide_tpu.models import ConditionalPointNet2
from slide_tpu.diffusion import calc_diffusion_hyperparams, diffusion_sampling
from slide_tpu.train.ema import ema_maturity


def main():
    ck, path = _latest_ckpt(os.path.join(EXPS, "kp"))
    n_updates = int(ck["iter"]) + 1
    print("ckpt:", path, "iter:", ck["iter"])
    cfg = keypoint_ddpm_config(CATEGORIES[0])
    rates = tuple(cfg["train_config"].get("ema_rate") or ())
    net = ConditionalPointNet2(cfg["pointnet_config"])
    sched = calc_diffusion_hyperparams(1000, 1e-4, 0.02)
    b = 8
    lbl = jnp.zeros((b,), jnp.int32)

    def gen_std(params):
        fn = jax.jit(lambda k: diffusion_sampling(
            lambda x, ts: net.apply({"params": params}, x, ts=ts, label=lbl),
            k, (b, 16, 3), sched))
        out = np.asarray(fn(jax.random.key(7)))
        return float(out.std())

    rows = {"ckpt": path, "iter": int(ck["iter"]),
            "raw_std": gen_std(ck["model_state_dict"])}
    for rate, shadow in zip(rates, ck.get("ema_state_list") or []):
        rows[f"ema_{rate}_std"] = gen_std(shadow)
        rows[f"ema_{rate}_maturity"] = round(ema_maturity(rate, n_updates), 4)
    print(json.dumps(rows, indent=2))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "kp_std_rederive.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print("->", out)


if __name__ == "__main__":
    main()
