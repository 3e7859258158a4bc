#!/usr/bin/env python3
"""Null-injection differential sweep (r18): the adversarial twin of the
sf0.001 correctness gate.

Builds a copy of an sf dir with deterministic NULLs planted in the
nullable business columns (every 41st row), then the caller runs the
normal Verify + selfcheck pair against it:

    python3 tools/nullsweep.py                 # writes /tmp/graft-nulldata
    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/graft-nulldata /tmp/nullsweep_out"
    python3 tools/selfcheck.py /tmp/graft-nulldata /tmp/nullsweep_out

Every oracle-gated key must hash-match DuckDB on this data too — the
"documented cross-engine contract holds on ANY data" standard the
ADVICE reviews apply. The r18 sweep found 66 latent divergences
(crashes on null text/payloads, =!= filters eating null keys, ORDER BY
null-position mismatches, CASE fall-throughs, moment-merge avgdl
deflation, signed zero); all fixed with oracle parity. Keep this green.

NOT part of the Scala engine — dev tooling only.
"""
import pyarrow.parquet as pq
import pyarrow as pa
import os, shutil, sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-nulldata"
STRIDE = 41

# Wave 2 (r18) added user_id (keyed state / sessions), embedding (vector
# stores), and p_name (string fns / fuzzy join). events.ts stays non-null
# BY DESIGN: the streaming replay fixture is time-keyed by construction
# (range-cut chunks), exactly as a production ingest boundary enforces a
# non-null event time.
PLAN = {
    "events": ["value", "event_type", "user_id"],
    "customer": ["c_acctbal", "c_mktsegment"],
    "orders": ["o_orderpriority", "o_totalprice"],
    "lineitem": ["l_discount"],
    "documents": ["text", "lang"],
    "embeddings": ["embedding"],
    # Wave 3 (r19, ADVICE r18 #2): p_brand/p_type — fn_string's concat_ws
    # and the SqlOps/WinOps part-dimension consumers were only proven on
    # non-null brand/type before this.
    "part": ["p_name", "p_brand", "p_type"],
}

def main():
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    for f in sorted(os.listdir(SRC)):
        if not f.endswith(".parquet"):
            continue
        name = f[:-8]
        t = pq.read_table(os.path.join(SRC, f))
        if name in PLAN:
            mask = pa.array([(i % STRIDE) == 0 for i in range(t.num_rows)])
            for cname in PLAN[name]:
                idx = t.schema.get_field_index(cname)
                col = t.column(idx)
                nulled = pa.compute.if_else(mask, pa.scalar(None, type=col.type), col)
                t = t.set_column(idx, t.schema.field(idx).with_nullable(True), nulled)
            print(f"{name}: nulled {PLAN[name]} ({t.num_rows} rows, stride {STRIDE})")
        pq.write_table(t, os.path.join(DST, f))
    print("->", DST)

if __name__ == "__main__":
    main()
