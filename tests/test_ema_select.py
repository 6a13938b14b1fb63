"""Eval-parameter selection semantics (VERDICT r4 item 2): short-run evals
must not pick an immature EMA shadow (shadows init to RANDOM params, so at
rate 0.999 / 1,200 steps the shadow is still ~30% random init — the round-4
exploded-generation bug).  Reference anchor: EMA is only ever evaluated at
>= 0.3M iterations (`train.py:273-284`)."""

import numpy as np

from slide_tpu.train.ema import (ema_maturity, select_eval_params,
                                 select_eval_params_from_ckpt)


RATES = (0.999, 0.9999)


def _trees():
    raw = {"w": np.zeros(3)}
    e0 = {"w": np.ones(3)}
    e1 = {"w": 2 * np.ones(3)}
    return raw, [e0, e1]


def test_maturity_values():
    assert ema_maturity(0.999, 0) == 0.0
    assert abs(ema_maturity(0.999, 1200) - (1 - 0.999 ** 1200)) < 1e-12
    # ~70% mature at 1200 steps -> NOT eligible at the 0.95 bar
    assert ema_maturity(0.999, 1200) < 0.95
    assert ema_maturity(0.999, 20000) > 0.95
    assert ema_maturity(0.9999, 20000) < 0.95


def test_short_run_falls_back_to_raw():
    raw, emas = _trees()
    chosen, desc = select_eval_params(raw, emas, RATES, 1200)
    assert desc == "raw"
    assert chosen is raw


def test_medium_run_picks_fast_shadow_only():
    raw, emas = _trees()
    chosen, desc = select_eval_params(raw, emas, RATES, 20000)
    assert desc == "ema_0.999"
    assert chosen is emas[0]


def test_long_run_picks_slowest_mature_shadow():
    raw, emas = _trees()
    # 0.9999^50000 = e^-5 ~ 0.0067 -> both mature; largest rate wins
    chosen, desc = select_eval_params(raw, emas, RATES, 50000)
    assert desc == "ema_0.9999"
    assert chosen is emas[1]


def test_no_ema_shadows():
    raw, _ = _trees()
    chosen, desc = select_eval_params(raw, None, (), 10**6)
    assert desc == "raw" and chosen is raw


def test_from_ckpt_uses_iter_plus_one():
    raw, emas = _trees()
    ckpt = {"iter": 1199, "model_state_dict": raw, "ema_state_list": emas}
    chosen, desc = select_eval_params_from_ckpt(ckpt, RATES)
    assert desc == "raw"
    ckpt["iter"] = 19999
    chosen, desc = select_eval_params_from_ckpt(ckpt, RATES)
    assert desc == "ema_0.999"
