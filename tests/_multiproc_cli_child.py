"""Child for the multi-host CLI smoke test: runs the ACTUAL production
launch path — ``cli.train.main()`` with the coordinator taken from the
standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID), exactly as a pod host would.  The parent asserts both
processes exit 0, the primary alone wrote checkpoints/metrics/results,
and the summary json appeared exactly once.
"""

import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
data_dir = sys.argv[3]
work_dir = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
# the production coordinator env contract (multihost.initialize reads these)
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(proc_id)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.chdir(work_dir)   # hyperparameter_study/ + runs/ land here (primary)

from cgr_mpnn_3d_tpu.cli.train import main  # noqa: E402

main(["--name", "CGR", "-d", "2", "--hidden_sizes", "16",
      "--dropout_ps", "0.0", "-ne", "2", "-bs", "8",
      "--val_frequency", "1", "--data_path", data_dir,
      "--save_path", os.path.join(work_dir, "saved"), "--dp", "4"])
print(f"CLI-DONE {proc_id}")
