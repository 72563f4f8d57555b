"""``python -m cgr_mpnn_3d_tpu`` — entry-point directory."""

import sys

HELP = """cgr-mpnn-3d-tpu — TPU-native CGR reaction-graph MPNN framework

entry points:
  python -m cgr_mpnn_3d_tpu.cli.train       train a model (reference train.py)
  python -m cgr_mpnn_3d_tpu.cli.test        evaluate a checkpoint (test.py)
  python -m cgr_mpnn_3d_tpu.cli.predict     activation-energy inference
  python -m cgr_mpnn_3d_tpu.cli.preprocess  Transition1x acquisition
  python -m cgr_mpnn_3d_tpu.cli.sweep       hyperparameter sweeps
  python -m cgr_mpnn_3d_tpu.cli.bench_ops   kernel microbenchmarks

docs: README.md, docs/KERNELS.md, docs/TRAINING.md
"""

if __name__ == "__main__":
    print(HELP)
    sys.exit(0 if len(sys.argv) <= 1 else 1)
