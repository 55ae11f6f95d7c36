#!/bin/bash
# Scaling check (round-13): run the bench subset at sf0.1 AND at a
# k×-scaled copy of it (graft.ScaleUp), and record per-query
# time(k·sf)/time(sf) into bench_bisect.json's "scaling" field. A ratio far
# above k is the one signal a fixed-sf bench can never produce — a
# super-linear plan (skewed single reducer, accidental all-pairs, a window
# over an unbounded partition). The round-11 substring-window skew would
# have read ~k² here.
#
# Run AFTER scripts/bisect_bench.sh: the bisect rewrites bench_bisect.json
# wholesale; this script read-modify-writes the "scaling" field into it
# (creating the file if the bisect hasn't run).
#
# Noise posture: same box, back-to-back, min-of-N sweeps (same discipline
# as the bisect). Fixed per-query overhead (Spark job scheduling, the
# multi-commit lake fixtures' metadata work) makes healthy ratios land
# BELOW k; the outlier line only fires above OUTLIER_MULT×k.
set -euo pipefail
cd "$(dirname "$0")/.."
K=${SPARK_GRAFT_SCALE_FACTOR:-3}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
SCALED=${SPARK_GRAFT_SCALED_DIR:-/tmp/graft_scaled_x$K}
# shellcheck source=bench_subset.env
. "$(dirname "$0")/bench_subset.env"
SUBSET=${SPARK_GRAFT_BISECT_SUBSET:-$GRAFT_BENCH_SUBSET}
PASSES=${SPARK_GRAFT_BENCH_PASSES:-2}

if [ ! -d "$SCALED/lineitem.parquet" ]; then
  echo "[scaling] materializing ${K}x copy of $SF at $SCALED ..." >&2
  sbt -batch "runMain graft.ScaleUp $SF $SCALED $K" >/dev/null
fi

run() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_ONLY="$SUBSET" \
    SPARK_GRAFT_BENCH_PASSES="$PASSES" sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | tail -1
}

echo "[scaling] base $SF ..." >&2
BASE_LINE=$(run "$SF")
echo "[scaling] scaled $SCALED ..." >&2
SCALED_LINE=$(run "$SCALED")

python3 - "$K" "$BASE_LINE" "$SCALED_LINE" <<'EOF'
import json, sys, pathlib
k, base_line, scaled_line = int(sys.argv[1]), sys.argv[2], sys.argv[3]
bdoc, sdoc = json.loads(base_line), json.loads(scaled_line)
b = {q: t for q, t in bdoc["queries"].items() if t >= 0}
s = {q: t for q, t in sdoc["queries"].items() if t >= 0}
brows, srows = bdoc.get("rows", {}), sdoc.get("rows", {})
common = sorted(set(b) & set(s))
per_query = {q: (round(s[q] / b[q], 3) if b[q] > 0 else None) for q in common}
# OUTPUT-NORMALIZED ratio: time-per-output-row at k·sf over time-per-
# output-row at sf. A growing-output operator (dedup_clusters: near-dup
# candidate PAIRS, its own output, grow ~quadratically in the replica
# count) is legitimately super-linear on wall time — the normalized
# ratio is what exposes a genuine plan regression on it, and conversely
# an output-constant query can't hide behind it.
def norm(q):
    if per_query[q] is None: return None
    br, sr = brows.get(q, -1), srows.get(q, -1)
    if br is None or sr is None or br <= 0 or sr <= 0: return None
    return round((s[q] / sr) / (b[q] / br), 3)
normalized = {q: norm(q) for q in common}
ratios = [r for r in per_query.values() if r is not None]
max_q = max((q for q in common if per_query[q] is not None),
            key=lambda q: per_query[q], default=None)
scaling = {"factor": k, "queries": common,
           "base_sec": {q: b[q] for q in common},
           "scaled_sec": {q: s[q] for q in common},
           "base_rows": {q: brows.get(q) for q in common},
           "scaled_rows": {q: srows.get(q) for q in common},
           "per_query_ratio": per_query,
           "normalized_ratio": normalized,
           "max_ratio": per_query.get(max_q), "max_query": max_q,
           "max_normalized_ratio": normalized.get(max_q)}
p = pathlib.Path("bench_bisect.json")
doc = json.loads(p.read_text()) if p.is_file() else {}
doc["scaling"] = scaling
p.write_text(json.dumps(doc) + "\n")
print(f"[scaling] factor {k}: per-query ratios "
      f"min {min(ratios):.2f} / median {sorted(ratios)[len(ratios)//2]:.2f} "
      f"/ max {max(ratios):.2f} ({max_q})")
OUTLIER_MULT = 1.67
for q in common:
    r, nr = per_query[q], normalized[q]
    if r is not None and r > OUTLIER_MULT * k:
        extra = f", {nr}x per output row" if nr is not None else ""
        print(f"[scaling] OUTLIER {q}: {r}x at {k}x data "
              f"({b[q]:.2f}s -> {s[q]:.2f}s{extra}) — super-linear plan?")
EOF
