#!/bin/bash
# Two-cluster-size scaling protocol (north_rule): same job, same materialized
# Z-order-clustered input, at N and 4N "executors", fresh JVM(s) per
# measurement, pinned to exactly N cores (taskset — an "N-core node" owns N
# cores total, GC included), trials interleaved, medians reported.
#
# Headline mode is MULTI-JVM executor emulation: local-cluster[1,8,8g] (N)
# vs local-cluster[4,8,8g] (4N) — each executor is its own JVM with its own
# heap/GC/JIT, the closest a single VM gets to real N vs 4N executor nodes,
# and the spark-submit path the north_rule names. The in-process
# local[8]/local[32] pair is kept as an ablation. A pure-CPU spin baseline
# measures this VM's hardware ceiling for any 4x-core speedup (32 physical
# cores, no SMT — the ceiling is hypervisor throttling / shared-host
# contention, not core topology).
#
# MUST run on an otherwise-idle box: one concurrent sbt run corrupts a trial
# by 5x (measured).
set -e
cd "$(dirname "$0")/.."
PAGES=${1:-200000000}
VARIANT=${2:-jtsfast}
TRIALS_MJ=${3:-5}
TRIALS_IP=${4:-3}
DATA=target/benchdata/features
JAR=target/scala-2.13/aerialconversionspark_2.13-0.1.0.jar

sbt -batch package > /dev/null

bench_mj() { # nexec cpulist
  SPARK_GRAFT_MASTER="local-cluster[$1,8,9216]" taskset -c $2 \
  /opt/spark/bin/spark-submit --master "local-cluster[$1,8,9216]" \
    --driver-memory 4g \
    --conf spark.executor.memory=8g \
    --conf spark.ui.enabled=false --conf spark.driver.host=localhost \
    --conf spark.sql.shuffle.partitions=$(( $1 * 8 )) \
    --conf spark.sql.session.timeZone=UTC \
    --conf spark.executor.extraJavaOptions="-Djts.overlay=ng -XX:ActiveProcessorCount=8" \
    --driver-java-options "-Djts.overlay=ng -XX:ActiveProcessorCount=4" \
    --class graft.ScalingBench "$JAR" bench $(( $1 * 8 )) "$DATA" $VARIANT 2>/dev/null | grep '^{'
  # ActiveProcessorCount pins each executor JVM's view to its 8-core share
  # (otherwise every executor sizes GC/JIT pools for all 32 cores). Note:
  # 4-executor trials remain bimodal even with it (loopback shuffle stalls —
  # see BENCH/BASELINE.md); medians over interleaved trials absorb it
}

bench_ip() { # cores cpulist
  taskset -c $2 /opt/spark/bin/spark-submit --master "local[$1]" --driver-memory 8g \
    --conf spark.ui.enabled=false --conf spark.driver.host=localhost \
    --conf spark.sql.shuffle.partitions=$1 \
    --conf spark.sql.session.timeZone=UTC \
    --driver-java-options "-Djts.overlay=ng -XX:ActiveProcessorCount=$1" \
    --class graft.ScalingBench "$JAR" bench $1 "$DATA" $VARIANT 2>/dev/null | grep '^{'
}

spin_pair() { # n 4n  → prints efficiency of the pure-CPU spin for that step
  python3 - "$1" "$2" <<'PYEOF'
import multiprocessing as mp, time, sys
def spin(a):
    x=0; t0=time.time()
    while time.time()-t0 < 6:
        for _ in range(1000000): x+=1
    return x
n, n4 = int(sys.argv[1]), int(sys.argv[2])
r={}
for procs in [n, n4]:
    with mp.Pool(procs) as p: res=p.map(spin, range(procs))
    r[procs]=sum(res)/6
print(f"{r[n4]/(4*r[n]):.3f}")
PYEOF
}

if [ ! -d "$DATA" ]; then
  echo "generating $PAGES pages (Z-order clustered)..."
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --conf spark.ui.enabled=false --conf spark.driver.host=localhost \
    --driver-java-options "-Djts.overlay=ng" \
    --class graft.ScalingBench "$JAR" gen "$PAGES" "$DATA" 2>/dev/null | grep '^{'
fi

SPIN=$(spin_pair 8 32)
echo "pure-CPU spin efficiency 8->32 (hardware ceiling): $SPIN"
SPIN28=$(spin_pair 2 8)
echo "pure-CPU spin efficiency 2->8: $SPIN28"

MJOUT=/tmp/scaling_mj.jsonl; : > $MJOUT
IPOUT=/tmp/scaling_ip.jsonl; : > $IPOUT
OUT28=/tmp/scaling_2v8.jsonl; : > $OUT28
for trial in $(seq 1 $TRIALS_MJ); do
  echo "multi-JVM trial $trial: 1 executor"
  bench_mj 1 0-7 | tee -a $MJOUT
  echo "multi-JVM trial $trial: 4 executors"
  bench_mj 4 0-31 | tee -a $MJOUT
done
for trial in $(seq 1 $TRIALS_IP); do
  echo "in-process trial $trial: local[8]"
  bench_ip 8 0-7 | tee -a $IPOUT
  echo "in-process trial $trial: local[32]"
  bench_ip 32 0-31 | tee -a $IPOUT
done
# the unthrottled operating point: N=2 → 4N=8 (spin ceiling ≈ 1.0 there,
# so this pair isolates ENGINE scaling from hypervisor throttling)
for trial in $(seq 1 $TRIALS_IP); do
  echo "2v8 trial $trial: local[2]"
  bench_ip 2 0-1 | tee -a $OUT28
  echo "2v8 trial $trial: local[8]"
  bench_ip 8 0-7 | tee -a $OUT28
done

# Summarize medians + efficiencies; BENCH/BASELINE.md is authored from these
# numbers (it carries the narrative: operating points, ceilings, ablations).
python3 - "$MJOUT" "$IPOUT" "$OUT28" "$SPIN" "$SPIN28" <<'EOF'
import json, sys, statistics
def load(path):
    by = {}
    for line in open(path):
        d = json.loads(line)
        by.setdefault(d["cores"], []).append(d["rows_per_sec"])
    return by
for name, path, spin in [("multi-JVM 8->32", sys.argv[1], sys.argv[4]),
                         ("in-process 8->32", sys.argv[2], sys.argv[4]),
                         ("in-process 2->8", sys.argv[3], sys.argv[5])]:
    by = load(path)
    lo_k, hi_k = min(by), max(by)
    lo, hi = statistics.median(by[lo_k]), statistics.median(by[hi_k])
    print(f"{name}: N={int(lo)} 4N={int(hi)} eff={hi/(4*lo):.3f} spin_ceiling={spin}")
    print(f"  trials N={sorted(by[lo_k])} 4N={sorted(by[hi_k])}")
EOF
