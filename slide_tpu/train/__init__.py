"""Training layer (reference L4+L7): task drivers sharing one pjit-sharded
train-step factory, EMA, reference-compatible checkpointing.

The reference's distributed runtime (process-per-GPU + NCCL allreduce hooks,
`distributed.py`) collapses into a single jitted step over a
`jax.sharding.Mesh`: batch sharded on the 'data' axis, params replicated,
gradient mean via XLA's implicit psum (SURVEY.md §2.3).
"""

from slide_tpu.train.ema import ema_init, ema_update, EMA_DEFAULT_RATES
from slide_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                        find_max_iter)
from slide_tpu.train.driver import (train_position_ddpm, train_autoencoder,
                                    train_latent_ddpm, train_upsampler,
                                    build_autoencoder, build_network,
                                    make_data_mesh, run_training,
                                    experiment_dirs)

__all__ = [
    "ema_init", "ema_update", "EMA_DEFAULT_RATES",
    "save_checkpoint", "load_checkpoint", "find_max_iter",
    "train_position_ddpm", "train_autoencoder", "train_latent_ddpm",
    "train_upsampler",
    "build_autoencoder", "build_network", "make_data_mesh", "run_training", "experiment_dirs",
]
