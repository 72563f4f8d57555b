"""Command-line entry points (mirror of the reference CLI surface):

  python -m cgr_mpnn_3d_tpu.cli.train       (train.py)
  python -m cgr_mpnn_3d_tpu.cli.test        (test.py)
  python -m cgr_mpnn_3d_tpu.cli.predict     (cli_tool/activation_energy_predictor.py)
  python -m cgr_mpnn_3d_tpu.cli.preprocess  (download_preprocess_datasets.py)
  python -m cgr_mpnn_3d_tpu.cli.sweep       (hyperparameter_tuning.py + wandb_evaluator.py)
  python -m cgr_mpnn_3d_tpu.cli.bench_ops   (kernel microbenchmarks; no reference equivalent)
"""
