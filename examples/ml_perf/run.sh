#!/usr/bin/env bash
# MLPerf DLRM-DCNv2 launcher (parity: keras-rs examples/ml_perf/run.sh,
# which provisions TPU VMs via gcloud and runs main.py on --worker=all).
#
# Single host / single chip:
#   ./run.sh smoke_test
#   ./run.sh v6e_8 --num_steps=1000
#   ./run.sh smoke_test --device_preprocessing   # id->COO inside the
#       jitted step: no host preprocessing threads at all
#
# Multi-host pod slice (run ON EVERY WORKER, e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`):
#   JAX discovers the slice topology from the TPU runtime; the dataloader
#   shards batches per process with identical seeded shuffles
#   (keras_rs_tpu/data/criteo.py), and stats/checkpoints sync over DCN
#   (keras_rs_tpu/parallel/multihost.py). No extra flags needed.
#
# Optional env (read by main.py as config overrides; equivalently pass
# --profile or set profile_dir/checkpoint_dir in the config):
#   KRT_PROFILE_DIR=/tmp/trace   capture a jax.profiler trace there
#   KRT_CHECKPOINT_DIR=...       Orbax checkpoint/resume directory
#
# Measurement flags:
#   --honest_timing   re-measure the train step after training under the
#                     scan-chained protocol (tunnel-proof device ms/step,
#                     reported as device_step_ms / device_examples_per_sec)
#   --eval_every N    evaluate every N steps; results carry an auc_curve
#                     (convergence-to-plateau evidence; eval wall time is
#                     excluded from the throughput clock)
set -euo pipefail

CONFIG="${1:-smoke_test}"
shift || true

cd "$(dirname "$0")/../.."
exec python -m examples.ml_perf.main --config "${CONFIG}" "$@"
