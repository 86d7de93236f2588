#!/bin/bash
set -uo pipefail
cd /root/repo
echo "=== battery sf0.001 ==="
rm -rf /tmp/v18o_sf0001
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/v18o_sf0001" > /tmp/v18o_sf0001.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.001 /tmp/v18o_sf0001 | tail -3
echo "=== battery sf0.01 (8 threads, local ckpt) ==="
rm -rf /tmp/v18o_sf001_c8
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v18o_sf001_c8" > /tmp/v18o_sf001_c8.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/v18o_sf001_c8 | tail -3
echo "=== battery sf0.1 ==="
rm -rf /tmp/v18o_sf01
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v18o_sf01" > /tmp/v18o_sf01.log 2>&1
python3 tools/check_oracle.py /root/testdata/sf0.1 /tmp/v18o_sf01 | tail -3
echo "=== determinism: 16 threads local ==="
rm -rf /tmp/v18o_sf001_c16
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v18o_sf001_c16" > /tmp/v18o_sf001_c16.log 2>&1
echo "=== determinism: 8 threads reliable ==="
rm -rf /tmp/v18o_sf001_r8 /tmp/ckpt_r18o_8
GRAFT_CHECKPOINT_DIR=/tmp/ckpt_r18o_8 SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v18o_sf001_r8" > /tmp/v18o_sf001_r8.log 2>&1
echo "=== determinism: 16 threads reliable ==="
rm -rf /tmp/v18o_sf001_r16 /tmp/ckpt_r18o_16
GRAFT_CHECKPOINT_DIR=/tmp/ckpt_r18o_16 SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v18o_sf001_r16" > /tmp/v18o_sf001_r16.log 2>&1
echo "--- compare 8v16 local ---"
python3 tools/compare_runs.py /tmp/v18o_sf001_c8 /tmp/v18o_sf001_c16 | tail -2
echo "--- compare 8v16 reliable ---"
python3 tools/compare_runs.py /tmp/v18o_sf001_r8 /tmp/v18o_sf001_r16 | tail -2
echo "--- compare cross-mode (local8 vs reliable8) ---"
python3 tools/compare_runs.py /tmp/v18o_sf001_c8 /tmp/v18o_sf001_r8 | tail -2
echo "=== bench run 1 (quiet) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" > /tmp/bench_r18o_1.log 2>&1
grep -o '"metric":"headline_total","value":[0-9.]*' /tmp/bench_r18o_1.log
echo "=== bench run 2 (quiet) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" > /tmp/bench_r18o_2.log 2>&1
grep -o '"metric":"headline_total","value":[0-9.]*' /tmp/bench_r18o_2.log
echo "=== BATTERY DONE ==="
