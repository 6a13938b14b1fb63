"""Command-line interface — the single entry point replacing the reference's
`distributed.py` launcher and the five `sampling_and_inference/` tools:

  python -m slide_tpu.cli train       -c config.json        (task-dispatched)
  python -m slide_tpu.cli generate    -c config.json --ckpt … --ema_idx …
  python -m slide_tpu.cli latent-generate -c config --ckpt … --ae_ckpt …
  python -m slide_tpu.cli encode      -c config --ckpt … --dataset_path …
  python -m slide_tpu.cli decode      -c config --ckpt … --dataset_path …
  python -m slide_tpu.cli reconstruct -c config --ckpt … --dataset_path …
  python -m slide_tpu.cli evaluate    --gen a.npz --ref b.npz [--all-metrics]
  python -m slide_tpu.cli gather      --save_dir … --world_size N

The reference spawns one process per GPU (`distributed.py:154-182`); here a
single process drives all local devices through the sharded train step.
Multi-host runs launch the same command once per host with
`--coordinator_address host0:port --num_processes N --process_id i`:
train then builds its mesh over the global device grid (rank-sharded data,
process-0-only checkpoints), and generate/latent-generate write per-rank
npz shards (`_rank_<r>`), merged afterwards with `gather`.  For eval-style
sharding WITHOUT jax.distributed, pass explicit `--rank/--world_size` to
independent processes instead.
"""

from slide_tpu.cli.main import main, load_inference_params, normalize_point_cloud

__all__ = ["main", "load_inference_params", "normalize_point_cloud"]
