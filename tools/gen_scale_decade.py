#!/usr/bin/env python3
"""Generate a 10x 'sf1-equivalent' of /root/testdata/sf0.1 into OUT_DIR for
the SCALING.md decade-extension study (r11 verdict item 8). Deterministic
(fixed seeds); driver-side tooling only — the engine never reads this code.

Scaling model per table (copy c = 0 is the original data, verbatim):
- events x10: copies are NEW series — user_id += c*(max+1), event_id +=
  c*(max+1); ts/type/value/props unchanged. Marginal distributions and
  per-series trajectories are identical to the source; series count x10.
- lineitem/orders x10: order keys offset per copy (l_orderkey/o_orderkey
  += c*(max+1)); dimension FKs (custkey, partkey, suppkey) unchanged —
  facts grow, dims fixed, referential integrity preserved.
- documents x10: copies are FRESH documents sampled from the corpus's own
  unigram distribution (per-(c, doc) seeded RNG, word count matched to the
  source doc, lang/source inherited so composition is preserved). Fresh
  sampling — not perturbed copies — so the dedup workload keeps its
  natural near-dup rate instead of gaining 9 synthetic twins per doc.
- embeddings x10: copies are FRESH unit vectors sampled from each label's
  fitted isotropic Gaussian (per-label centroid + matched residual
  variance), so cluster geometry is preserved without creating
  nearer-than-natural neighbor pairs.
Remaining tables are copied through unchanged.

Usage: gen_scale_decade.py [SRC_DIR] [OUT_DIR] [K]
Defaults: /root/testdata/sf0.1 /tmp/sf1eq 10
"""
import sys, os, shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1eq"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)

for t in ("region", "nation", "customer", "supplier", "part"):
    shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

# --- events: tiled new series ---
ev = pq.read_table(f"{src}/events.parquet")
uid = ev.column("user_id").to_numpy()
eid = ev.column("event_id").to_numpy()
umax, emax = uid.max() + 1, eid.max() + 1
parts = []
for c in range(K):
    tbl = ev.set_column(ev.schema.get_field_index("user_id"), "user_id",
                        pa.array(uid + c * umax, pa.int64()))
    tbl = tbl.set_column(tbl.schema.get_field_index("event_id"), "event_id",
                         pa.array(eid + c * emax, pa.int64()))
    parts.append(tbl)
pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet")
print(f"events: {ev.num_rows} -> {ev.num_rows * K}")

# --- lineitem / orders: order-key offsets ---
# ONE shared offset computed from orders (the FK parent): per-table maxima
# would silently break l_orderkey -> o_orderkey referential integrity in
# every copy if the max lineitem orderkey ever differed from the max order
# key (e.g. a source with a childless top order).
kmax = pq.read_table(f"{src}/orders.parquet",
                     columns=["o_orderkey"]).column("o_orderkey").to_numpy().max() + 1
for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
    tb = pq.read_table(f"{src}/{t}.parquet")
    kv = tb.column(key).to_numpy()
    assert kv.max() < kmax, f"{t}.{key} exceeds the orders key space"
    parts = []
    for c in range(K):
        parts.append(tb.set_column(tb.schema.get_field_index(key), key,
                                   pa.array(kv + c * kmax, pa.int64())))
    pq.write_table(pa.concat_tables(parts), f"{out}/{t}.parquet")
    print(f"{t}: {tb.num_rows} -> {tb.num_rows * K}")

# --- documents: fresh unigram-sampled docs ---
doc = pq.read_table(f"{src}/documents.parquet")
texts = doc.column("text").to_pylist()
dids = doc.column("doc_id").to_numpy()
dmax = dids.max() + 1
words, counts = np.unique(
    np.array([w for t in texts for w in t.split()]), return_counts=True)
probs = counts / counts.sum()
wc = np.array([len(t.split()) for t in texts])
parts = [doc]
for c in range(1, K):
    rng = np.random.default_rng(42_000 + c)
    new_texts = [" ".join(rng.choice(words, size=n, p=probs)) for n in wc]
    tbl = doc.set_column(doc.schema.get_field_index("doc_id"), "doc_id",
                         pa.array(dids + c * dmax, pa.int64()))
    tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text",
                         pa.array(new_texts, pa.string()))
    tbl = tbl.set_column(tbl.schema.get_field_index("n_chars"), "n_chars",
                         pa.array([len(t) for t in new_texts], pa.int64()))
    parts.append(tbl)
pq.write_table(pa.concat_tables(parts), f"{out}/documents.parquet")
print(f"documents: {doc.num_rows} -> {doc.num_rows * K} (vocab {len(words)})")

# --- embeddings: fresh per-label isotropic samples ---
emb = pq.read_table(f"{src}/embeddings.parquet")
vids = emb.column("vec_id").to_numpy()
vmax = vids.max() + 1
labels = emb.column("label").to_numpy()
V = np.stack(emb.column("embedding").to_numpy(zero_copy_only=False))
dim = V.shape[1]
model = {}
for l in np.unique(labels):
    X = V[labels == l]
    mu = X.mean(axis=0)
    s = np.sqrt(((X - mu) ** 2).sum(axis=1).mean() / dim)
    model[l] = (mu, s)
parts = [emb]
etype = pa.list_(pa.float32())
for c in range(1, K):
    rng = np.random.default_rng(77_000 + c)
    newV = np.empty_like(V)
    for i, l in enumerate(labels):
        mu, s = model[l]
        v = mu + s * rng.standard_normal(dim)
        newV[i] = (v / np.linalg.norm(v)).astype(np.float32)
    tbl = emb.set_column(emb.schema.get_field_index("vec_id"), "vec_id",
                         pa.array(vids + c * vmax, pa.int64()))
    tbl = tbl.set_column(tbl.schema.get_field_index("embedding"), "embedding",
                         pa.array(list(newV), etype))
    parts.append(tbl)
pq.write_table(pa.concat_tables(parts), f"{out}/embeddings.parquet")
print(f"embeddings: {emb.num_rows} -> {emb.num_rows * K}")
print(f"done -> {out}")
