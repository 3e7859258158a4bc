#!/usr/bin/env python3
"""Fuzz-injection differential sweep (r19, r18 verdict #2): nullsweep's
superset. Builds a copy of an sf dir carrying BOTH the nullsweep PLAN's
NULL injections AND deterministic adversarial values, then the normal
Verify + selfcheck pair must be green against it:

    python3 tools/fuzzsweep.py [srcSf [dstDir]]      # default sf0.001
    SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify <dst> /tmp/fuzz_out"
    python3 tools/selfcheck.py <dst> /tmp/fuzz_out

Injected (disjoint strides, all deterministic — no RNG):
  - NaN / +Inf / -Inf into the measure columns events.value,
    lineitem.l_discount, orders.o_totalprice (strides 101/97 with fixed
    offsets). The seams these target: NaN ordering (both engines sort
    NaN last / treat it greatest, but CAST-to-int/decimal crashes differ),
    Inf*0, DECIMAL casts, band arithmetic.
  - empty "" / whitespace-only "  \\t " / multi-byte unicode (combining
    marks, RTL Hebrew+Arabic, astral-plane 𝄞/emoji, CJK, ligature) into
    documents.text; empty string into part.p_name (stride 53).
  - zero-length [] and all-zero vectors into embeddings.embedding
    (stride 61) — the norm-0 / dim-0 ingest boundary every vector op
    must reject or define.
  - duplicate-PK full-row copies appended for orders (every 71st row) —
    the MERGE multi-match / snapshot-diff / uniqueness-audit seams where
    duplicate keys are a real production concern. documents/embeddings
    instead get duplicate CONTENT under FRESH ids (text/embedding copied
    from every 71st row, id = max_id+1+k): that is what corpus
    duplicates actually look like (same bytes, new id — the thing the
    dedup family exists to find), while id-uniqueness in the id-keyed
    corpus tables stays a generator invariant (same class as events.ts
    non-null). events is NOT duplicated: its replay fixture is range-cut
    by event time and a duplicated tail would change batch boundaries,
    which is the replay harness's domain, not a data seam.

Same contract as the null sweep: every oracle-gated key must hash-match
DuckDB on this copy. NOT part of the Scala engine — dev tooling only.
"""
import pyarrow.parquet as pq
import pyarrow as pa
import os, shutil, sys

from nullsweep import PLAN as NULL_PLAN, STRIDE as NULL_STRIDE

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-fuzzdata"

NAN, PINF, NINF = float("nan"), float("inf"), float("-inf")
UNICODE_SOUP = ("café áccent שלום "
                "مرحبا \U0001d11e音楽 "
                "\U0001f3b5 ﬀligature")

# table -> column -> [(stride, offset, value)]
FUZZ = {
    "events":    {"value": [(101, 5, NAN), (101, 49, PINF), (101, 80, NINF)]},
    "lineitem":  {"l_discount": [(97, 11, NAN), (97, 43, PINF), (97, 77, NINF)]},
    "orders":    {"o_totalprice": [(101, 17, NAN), (101, 59, PINF), (101, 90, NINF)]},
    "documents": {"text": [(53, 7, ""), (53, 20, "  \t "),
                           (53, 33, UNICODE_SOUP)]},
    "part":      {"p_name": [(53, 40, "")]},
}
EMB_EMPTY_STRIDE, EMB_EMPTY_OFF = 61, 3      # -> []
EMB_ZERO_STRIDE, EMB_ZERO_OFF = 61, 30       # -> all-zero vector
DUP_TABLES = {"orders": 71}                   # full-row duplicate PKs
CONTENT_DUP = {"documents": ("doc_id", 71), "embeddings": ("vec_id", 71)}


def main():
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    for f in sorted(os.listdir(SRC)):
        if not f.endswith(".parquet"):
            continue
        name = f[:-8]
        t = pq.read_table(os.path.join(SRC, f))
        n = t.num_rows
        notes = []
        # 1. nullsweep's NULL plan (superset contract)
        if name in NULL_PLAN:
            mask = pa.array([(i % NULL_STRIDE) == 0 for i in range(n)])
            for cname in NULL_PLAN[name]:
                idx = t.schema.get_field_index(cname)
                c = t.column(idx)
                t = t.set_column(idx, t.schema.field(idx).with_nullable(True),
                                 pa.compute.if_else(mask,
                                     pa.scalar(None, type=c.type), c))
            notes.append(f"nulls {NULL_PLAN[name]}")
        # 2. scalar fuzz values
        for cname, specs in FUZZ.get(name, {}).items():
            idx = t.schema.get_field_index(cname)
            col = t.column(idx).to_pylist()
            for stride, off, val in specs:
                for i in range(off, n, stride):
                    if col[i] is not None:   # keep the null plan's NULLs
                        col[i] = val
            t = t.set_column(idx, t.schema.field(idx),
                             pa.array(col, type=t.column(idx).type))
            notes.append(f"fuzz {cname} x{len(specs)}")
        # 2b. keep DERIVED fixture columns consistent with the fuzzed
        # base column (n_chars == length(text) is a generator invariant
        # the corpus-stats keys rely on; breaking it tests the generator,
        # not the engine)
        if name == "documents":
            ti = t.schema.get_field_index("text")
            ni = t.schema.get_field_index("n_chars")
            texts = t.column(ti).to_pylist()
            chars = t.column(ni).to_pylist()
            fixed = [len(x) if x is not None else c
                     for x, c in zip(texts, chars)]
            t = t.set_column(ni, t.schema.field(ni),
                             pa.array(fixed, type=t.column(ni).type))
            notes.append("n_chars recomputed")
        # 3. degenerate embeddings
        if name == "embeddings":
            idx = t.schema.get_field_index("embedding")
            col = t.column(idx).to_pylist()
            dim = next(len(v) for v in col if v)
            for i in range(EMB_EMPTY_OFF, n, EMB_EMPTY_STRIDE):
                if col[i] is not None:
                    col[i] = []
            for i in range(EMB_ZERO_OFF, n, EMB_ZERO_STRIDE):
                if col[i] is not None:
                    col[i] = [0.0] * dim
            t = t.set_column(idx, t.schema.field(idx),
                             pa.array(col, type=t.column(idx).type))
            notes.append("embedding []/zero-vec")
        # 4. duplicate-PK appended full-row copies (orders only)
        if name in DUP_TABLES:
            stride = DUP_TABLES[name]
            dup = t.take(list(range(0, n, stride)))
            t = pa.concat_tables([t, dup])
            notes.append(f"+{dup.num_rows} dup-PK rows")
        # 5. duplicate CONTENT under fresh ids (doc/vector corpora)
        if name in CONTENT_DUP:
            idcol, stride = CONTENT_DUP[name]
            dup = t.take(list(range(0, t.num_rows, stride))).to_pylist()
            mx = max(r[idcol] for r in t.to_pylist() if r[idcol] is not None)
            for k, r in enumerate(dup):
                r[idcol] = mx + 1 + k
            t = pa.concat_tables([
                t, pa.Table.from_pylist(dup, schema=t.schema)])
            notes.append(f"+{len(dup)} content-dup rows (fresh ids)")
        if notes:
            print(f"{name}: {', '.join(notes)} ({t.num_rows} rows)")
        pq.write_table(t, os.path.join(DST, f))
    print("->", DST)


if __name__ == "__main__":
    main()
