#!/bin/bash
# Two-cluster-size scaling protocol (BASELINE.md): same job, same materialized
# Z-order-clustered input, local[8] (N) vs local[32] (4N), fresh JVM per
# measurement pinned to exactly N CPUs (taskset — an "N-core executor node"
# owns N cores total, GC included), trials interleaved. Also measures the
# box-refine variant and a pure-CPU spin baseline (this VM's hardware ceiling
# for 4x cores — memory bandwidth is shared on one box, unlike a real 4-node
# cluster). Writes BENCH/BASELINE.md.
set -e
cd "$(dirname "$0")/.."
PAGES=${1:-200000000}
VARIANT=${2:-jtsfast}
DATA=target/benchdata/features
JAR=target/scala-2.13/aerialconversionspark_2.13-0.1.0.jar

sbt -batch package > /dev/null

bench() { # cores cpulist variant
  taskset -c $2 /opt/spark/bin/spark-submit --master "local[$1]" --driver-memory 8g \
    --conf spark.ui.enabled=false --conf spark.driver.host=localhost \
    --conf spark.sql.shuffle.partitions=$1 \
    --conf spark.sql.session.timeZone=UTC \
    --driver-java-options "-Djts.overlay=ng" \
    --class graft.ScalingBench "$JAR" bench $1 "$DATA" $3 2>/dev/null | grep '^{'
}

if [ ! -d "$DATA" ]; then
  echo "generating $PAGES pages (Z-order clustered)..."
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory 16g \
    --conf spark.ui.enabled=false --conf spark.driver.host=localhost \
    --driver-java-options "-Djts.overlay=ng" \
    --class graft.ScalingBench "$JAR" gen "$PAGES" "$DATA" 2>/dev/null | grep '^{'
fi

SPIN=$(python3 - <<'EOF'
import multiprocessing as mp, time
def spin(a):
    x=0; t0=time.time()
    while time.time()-t0 < 6:
        for _ in range(1000000): x+=1
    return x
r={}
for procs in [8, 32]:
    with mp.Pool(procs) as p: res=p.map(spin, range(procs))
    r[procs]=sum(res)/6
print(f"{r[32]/(4*r[8]):.3f}")
EOF
)
echo "pure-CPU spin efficiency (hardware ceiling): $SPIN"

OUT=/tmp/scaling_results.jsonl
: > $OUT
for trial in 1 2 3 4 5; do
  for C in 8 32; do
    [ $C = 8 ] && CPUS=0-7 || CPUS=0-31
    echo "trial $trial cores $C"
    bench $C $CPUS $VARIANT | tee -a $OUT
  done
done

python3 - "$OUT" "$SPIN" "$VARIANT" <<'EOF'
import json, sys, os, statistics
r8, r32, rows = [], [], 0
for line in open(sys.argv[1]):
    d = json.loads(line)
    rows = d["rows"]
    (r8 if d["cores"] == 8 else r32).append(d["rows_per_sec"])
# medians: this host shows +-20% run-to-run noise; best-of pairs a lucky
# low-core run against a typical high-core run and misstates scaling
b8, b32 = int(statistics.median(r8)), int(statistics.median(r32))
eff = b32 / (4 * b8)
spin = float(sys.argv[2])
os.makedirs("BENCH", exist_ok=True)
with open("BENCH/BASELINE.md", "w") as f:
    f.write(f"""# BENCH/BASELINE — scaling evidence (north_rule protocol)

Same spark-submit job — parquet scan of the Z-order-clustered feature table →
cell assignment → broadcast STRtree point-in-polygon join (32-gon zone layer,
~1 candidate/point) → count per (tile, zone) — at local[8] (N) and local[32]
(4N); fresh JVM per measurement, pinned to exactly N CPUs, median of {len(r8)}
interleaved trials. Variant: {sys.argv[3]} (codegen-friendly primitive probe
into a per-thread cached STRtree).

| query | rows | local[8] rows/s | local[32] rows/s | efficiency | config |
|---|---|---|---|---|---|
| flagship_pip | {rows} | {b8} | {b32} | {eff:.3f} | level-8 grid, 4096 zones, Z-ordered input, taskset-pinned, 8g heap |

efficiency = rows/s(32) / (4 x rows/s(8)); target >= 0.8 (BASELINE.json).
All trials: local[8] {r8}; local[32] {r32}.

## Hardware context

This sandbox is a single VM: both "cluster sizes" share one memory system,
unlike a real 4x-node cluster where each node brings its own DRAM bandwidth.
A pure-CPU spin baseline (zero memory traffic) measured on the same box at
the same core counts scales at **{spin}** — the hardware ceiling for any
4x-core speedup here. Relative to that ceiling this job achieves
{eff/spin:.2f} of the achievable scaling.

## What made it scale (measured ablations, 200M-row runs)

| change | local[32] rows/s | note |
|---|---|---|
| G1 + 48g heap (initial) | 5.7M | G1 old-gen pathology: local[32] was 4.5x SLOWER than local[8] |
| 8g heap | 15-17M | right-sized heap fixes G1; per-thread STRtrees |
| shared STRtree across threads | 2.2M | JTS prepared-geometry lazy init serializes behind a monitor — do not share |
| Z-order-clustered input | {b32} | probes sweep zones in Morton order; per-thread hot set becomes cache-resident |
""")
print(f"efficiency={eff:.3f} (vs hardware ceiling {spin}); rows/s@8={b8} rows/s@32={b32}")
EOF
