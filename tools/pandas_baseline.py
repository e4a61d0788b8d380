"""Single-node pandas baseline for a subset of the headline queries —
the reference's execution engine is eager pandas (SURVEY §1), so this
is the apples-to-apples throughput comparison BASELINE.md lacks.

Implements the same semantics as the Spark queries (same filters,
groupings, outputs) in idiomatic pandas; prints one JSON line shaped
like bench.py for side-by-side reading.
"""

from __future__ import annotations

import json
import os
import re
import time

import numpy as np
import pandas as pd


def q1_pricing_summary(dfs):
    li = dfs["lineitem"]
    f = li[li["l_shipdate"] <= pd.Timestamp("1998-09-02")]
    g = f.assign(
        disc_price=f["l_extendedprice"] * (1 - f["l_discount"]),
        charge=f["l_extendedprice"] * (1 - f["l_discount"]) * (1 + f["l_tax"]),
    ).groupby(["l_returnflag", "l_linestatus"])
    return g.agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_quantity", "size"),
    ).reset_index()


def q3_shipping_priority(dfs):
    cutoff = pd.Timestamp("1995-03-15")
    c = dfs["customer"]
    o = dfs["orders"]
    l = dfs["lineitem"]
    cb = c[c["c_mktsegment"] == "BUILDING"]
    oo = o[o["o_orderdate"] < cutoff].merge(cb, left_on="o_custkey", right_on="c_custkey")
    ll = l[l["l_shipdate"] > cutoff].merge(oo, left_on="l_orderkey", right_on="o_orderkey")
    ll = ll.assign(rev=ll["l_extendedprice"] * (1 - ll["l_discount"]))
    g = (
        ll.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])["rev"]
        .sum()
        .reset_index(name="revenue")
    )
    return g.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)


def dedup_exact_groups(dfs):
    docs = dfs["documents"]
    import hashlib

    norm = (
        docs["text"].str.lower().str.replace(r"[^a-z0-9]+", " ", regex=True).str.strip()
    )
    fp = norm.map(lambda s: hashlib.md5(s.encode()).hexdigest())
    return (
        docs.assign(content_fp=fp)
        .groupby("content_fp")
        .agg(representative_id=("doc_id", "min"), n_docs=("doc_id", "size"))
        .reset_index()
    )


def text_quality(dfs):
    docs = dfs["documents"]
    toks = docs["text"].str.lower().str.findall(r"[a-z0-9]+")
    n_tokens = toks.str.len()
    n_chars = docs["text"].str.len()
    punct = docs["text"].str.count(r"[.,;:!?]")
    stop = toks.map(lambda ts: sum(t in {"the", "a", "and", "of", "to", "is", "in", "that", "it", "for"} for t in ts))
    return pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "n_tokens": n_tokens,
            "punct_ratio": punct / np.maximum(n_chars, 1),
            "stopword_ratio": stop / np.maximum(n_tokens, 1),
        }
    )


def ngram_jaccard_pairs(dfs):
    docs = dfs["documents"]
    shingle_sets = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        ts = re.findall(r"[a-z0-9]+", text.lower())
        shingle_sets[did] = {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}
    postings: dict[str, list] = {}
    for did, sh in shingle_sets.items():
        for s in sh:
            postings.setdefault(s, []).append(did)
    from collections import Counter

    common = Counter()
    for ids in postings.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                common[(ids[i], ids[j])] += 1
    rows = []
    for (a, b), n in common.items():
        jac = n / (len(shingle_sets[a]) + len(shingle_sets[b]) - n)
        if jac >= 0.05:
            rows.append((a, b, n, jac))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "n_common", "jaccard"])


def embedding_cosine_topk(dfs):
    emb = dfs["embeddings"]
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    out = []
    for qpos in np.flatnonzero(ids < 10):
        cos = (mat @ mat[qpos]) / (norms * norms[qpos])
        cos[qpos] = -np.inf
        top = np.argsort(-cos, kind="stable")[:5]
        out.extend((int(ids[qpos]), int(ids[t]), float(cos[t]), r + 1) for r, t in enumerate(top))
    return pd.DataFrame(out, columns=["query_id", "neighbor_id", "cosine", "rank"])




def basket_cooccurrence_lift(dfs):
    li = dfs["lineitem"]
    items = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_baskets = items["l_orderkey"].nunique()
    supp = items.groupby("l_partkey").size().rename("s")
    pairs = items.merge(items, on="l_orderkey")
    pairs = pairs[pairs["l_partkey_x"] < pairs["l_partkey_y"]]
    pc = pairs.groupby(["l_partkey_x", "l_partkey_y"]).size().rename("support").reset_index()
    pc = pc[pc["support"] >= 2]
    pc = pc.merge(supp.rename("supp_a"), left_on="l_partkey_x", right_index=True)
    pc = pc.merge(supp.rename("supp_b"), left_on="l_partkey_y", right_index=True)
    pc["lift"] = pc["support"].astype(float) * float(n_baskets) / (
        pc["supp_a"].astype(float) * pc["supp_b"].astype(float)
    )
    return pc


def paragraph_dedup_corpus(dfs):
    d = dfs["documents"]
    text = (
        "Shared boilerplate: all rights reserved.\n"
        + "Doc " + d["doc_id"].astype(str) + " body: " + d["text"].str.slice(0, 60) + "\n"
        + "Group banner " + (d["doc_id"] % 7).astype(str) + "\n"
        + "Doc " + d["doc_id"].astype(str) + " closing line."
    )
    paras = (
        pd.DataFrame({"doc_id": d["doc_id"], "para": text.str.split("\n")})
        .explode("para")
        .reset_index(drop=True)
    )
    paras["pos"] = paras.groupby("doc_id").cumcount()
    paras = paras.sort_values(["doc_id", "pos"], kind="stable")
    kept = ~paras.duplicated(subset="para", keep="first")
    paras["kept"] = kept
    out = paras.groupby("doc_id").agg(
        clean_text=("para", lambda g: "\n".join(g[paras.loc[g.index, "kept"]])),
        n_kept=("kept", "sum"),
    )
    return out

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "dedup_exact_groups": dedup_exact_groups,
    "text_quality": text_quality,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "embedding_cosine_topk": embedding_cosine_topk,
    "basket_cooccurrence_lift": basket_cooccurrence_lift,
    "paragraph_dedup_corpus": paragraph_dedup_corpus,
}



def bm25_topk_docs(dfs):
    """Same rational-idf BM25 as text/retrieval.py, eager pandas."""
    import re as _re
    from collections import Counter

    docs = dfs["documents"]
    q = ["spark", "join", "window"]
    tok = docs["text"].str.lower().map(lambda t: _re.findall(r"[a-z0-9]+", t or ""))
    dl = tok.map(len)
    n = len(docs)
    avgdl = dl.sum() / n
    dfreq = Counter()
    tfs = tok.map(Counter)
    for c in tfs:
        dfreq.update(c.keys())
    scores = []
    for c, l in zip(tfs, dl):
        sc = 0.0
        for t in q:
            tf = c.get(t, 0)
            if tf:
                idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
                sc += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (l / avgdl)))
        scores.append(sc)
    out = docs.assign(score=scores)[["doc_id", "score"]]
    return out.sort_values(["score", "doc_id"], ascending=[False, True]).head(10)


def entity_match_ed1(dfs):
    """FastSS deletion-neighborhood ED<=1 match, eager pandas."""
    c = dfs["customer"]
    dirty = c[c["c_custkey"] % 3 == 1].copy()
    p = dirty["c_custkey"] % 9
    dirty["r_name"] = [
        nm[: 9 + int(pp)] + nm[10 + int(pp):] for nm, pp in zip(dirty["c_name"], p)
    ]
    def variants(s):
        return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}
    left_idx = {}
    for key, nm, nk in zip(c["c_custkey"], c["c_name"], c["c_nationkey"]):
        for v in variants(nm):
            left_idx.setdefault((nk, v), []).append((key, nm))
    pairs = set()
    for rid, rnm, nk in zip(dirty["c_custkey"], dirty["r_name"], dirty["c_nationkey"]):
        for v in variants(rnm):
            for key, nm in left_idx.get((nk, v), ()):
                pairs.add((key, nm, rid, rnm))
    def lev1(a, b):
        if a == b:
            return 0
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return 2
        if la == lb:
            return 1 if sum(x != y for x, y in zip(a, b)) == 1 else 2
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = j = diff = 0
        while i < la and j < lb:
            if a[i] != b[j]:
                diff += 1
                if diff > 1:
                    return 2
                j += 1
            else:
                i += 1; j += 1
        return 1
    rows = [(k, nm, rid, rnm) for (k, nm, rid, rnm) in pairs if lev1(nm, rnm) <= 1]
    return pd.DataFrame(rows, columns=["c_custkey", "c_name", "r_id", "r_name"])


def triangle_count_parts(dfs):
    """Recurring co-purchase triangles, eager pandas."""
    li = dfs["lineitem"][["l_orderkey", "l_partkey"]]
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    cnt = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    e = cnt[cnt >= 2].reset_index()[["l_partkey_x", "l_partkey_y"]]
    e.columns = ["a", "b"]
    e1 = e.rename(columns={"a": "x", "b": "y"})
    e2 = e.rename(columns={"a": "y", "b": "z"})
    tri = e1.merge(e2, on="y").merge(
        e.rename(columns={"a": "x", "b": "z"}), on=["x", "z"]
    )
    corners = pd.concat([tri["x"], tri["y"], tri["z"]]).value_counts()
    deg = pd.concat([e["a"], e["b"]]).value_counts()
    out = deg.rename("deg").to_frame()
    out["n_triangles"] = corners.reindex(out.index).fillna(0).astype(int)
    return out.reset_index(names="v")


QUERIES["bm25_topk_docs"] = bm25_topk_docs
QUERIES["entity_match_ed1"] = entity_match_ed1
QUERIES["triangle_count_parts"] = triangle_count_parts


def bpe_pair_stats(dfs):
    """Eager-pandas BPE iteration-0 pair counts (mirrors the
    registered query: word-count table, char pairs + </w>, top 20)."""
    import collections

    words = collections.Counter()
    for t in dfs["documents"]["text"]:
        words.update(re.findall(r"[a-z0-9]+", t.lower()))
    pairs = collections.Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            pairs[w[i] + " " + w[i + 1]] += c
        pairs[w[-1] + " </w>"] += c
    return sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]


def kcore_membership(dfs):
    """Eager-pandas 3-core over the recurring-pair part graph
    (merge-based edges, dict-based peel to fixpoint)."""
    li = dfs["lineitem"][["l_orderkey", "l_partkey"]]
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    cnt = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    edges = set(cnt[cnt >= 2].index)
    while True:
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= 3}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {v: d for v, d in deg.items() if d >= 3}


QUERIES["bpe_pair_stats"] = bpe_pair_stats
QUERIES["kcore_membership"] = kcore_membership


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    tables = ["lineitem", "orders", "customer", "documents", "embeddings"]
    dfs = {t: pd.read_parquet(f"{sf_dir}/{t}.parquet") for t in tables}
    timings = {}
    for name, fn in QUERIES.items():
        fn(dfs)  # warm-up (match bench.py methodology)
        t0 = time.perf_counter()
        fn(dfs)
        timings[name] = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "pandas_single_node_baseline",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(m.group(1)) if m else -1.0,
            }
        )
    )




# ---- round-5 additions: the round-4 iterative/graph families ---------


def label_propagation_communities(dfs):
    """Eager-pandas 3-iteration LPA over the customer-supplier
    bipartite graph (merge + groupby count + tie-broken argmax)."""
    o = dfs["orders"][["o_orderkey", "o_custkey"]]
    li = dfs["lineitem"][["l_orderkey", "l_suppkey"]]
    p = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    pairs = pd.DataFrame(
        {"c": p["o_custkey"] * 2, "s": p["l_suppkey"] * 2 + 1}
    ).drop_duplicates()
    edges = pd.DataFrame(
        {
            "s": np.concatenate([pairs["c"].values, pairs["s"].values]),
            "d": np.concatenate([pairs["s"].values, pairs["c"].values]),
        }
    )
    nodes = np.unique(edges["s"].values)
    labels = pd.DataFrame({"node": nodes, "label": nodes})
    for _ in range(3):
        j = edges.merge(labels, left_on="s", right_on="node")
        cnt = j.groupby(["d", "label"]).size().reset_index(name="c")
        cnt = cnt.sort_values(["d", "c", "label"], ascending=[True, False, True])
        labels = (
            cnt.drop_duplicates("d")[["d", "label"]]
            .rename(columns={"d": "node"})
            .reset_index(drop=True)
        )
    return labels


def deterministic_walks_supplier(dfs):
    """Eager-pandas deterministic random walks (2 walks x length 4),
    hashed neighbor picks vectorized in numpy."""

    def mix32(node, walk, k):
        M = np.uint64(73244475)
        s = (
            node.astype(np.uint64) % np.uint64(2**32)
            + (walk.astype(np.uint64) % np.uint64(2**32)) * np.uint64(40503)
            + np.uint64(k) * np.uint64(73244475)
        ) % np.uint64(2**32)
        s = ((s ^ (s >> np.uint64(16))) * M) % np.uint64(2**32)
        return (s ^ (s >> np.uint64(16))).astype(np.int64)

    o = dfs["orders"][["o_orderkey", "o_custkey"]]
    li = dfs["lineitem"][["l_orderkey", "l_suppkey"]]
    p = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    pairs = pd.DataFrame(
        {"c": p["o_custkey"] * 2, "s": p["l_suppkey"] * 2 + 1}
    ).drop_duplicates()
    e = pd.DataFrame(
        {
            "u": np.concatenate([pairs["c"].values, pairs["s"].values]),
            "v": np.concatenate([pairs["s"].values, pairs["c"].values]),
        }
    ).drop_duplicates()
    e = e.sort_values(["u", "v"]).reset_index(drop=True)
    e["idx"] = e.groupby("u").cumcount()
    degs = e.groupby("u").size().reset_index(name="deg")
    starts = degs[["u"]].rename(columns={"u": "start"})
    cur = pd.concat(
        [starts.assign(walk=w) for w in range(2)], ignore_index=True
    ).assign(step=0)
    cur["node"] = cur["start"]
    out = [cur]
    for k in range(1, 4):
        w = cur.merge(degs, left_on="node", right_on="u")
        w["pick"] = mix32(w["node"].values, w["walk"].values, k) % w["deg"].values
        stepped = w.merge(
            e, left_on=["node", "pick"], right_on=["u", "idx"], suffixes=("", "_e")
        )[["start", "walk", "v"]].rename(columns={"v": "node"})
        stepped["step"] = k
        out.append(stepped)
        cur = stepped
    return pd.concat(out, ignore_index=True)


def substring_dup_spans(dfs):
    """Eager-pandas ExactSubstr spans: per-position 8-gram table,
    cross-doc df filter, gaps-and-islands merge."""
    docs = dfs["documents"][["doc_id", "text"]]
    toks = docs["text"].str.lower().str.findall(r"[a-z0-9]+")
    rows_doc, rows_pos, rows_gram = [], [], []
    for doc_id, t in zip(docs["doc_id"].values, toks.values):
        for i in range(max(len(t) - 7, 0)):
            rows_doc.append(doc_id)
            rows_pos.append(i)
            rows_gram.append(" ".join(t[i : i + 8]))
    g = pd.DataFrame({"doc_id": rows_doc, "pos": rows_pos, "gram": rows_gram})
    hot = g.groupby("gram")["doc_id"].nunique()
    hot = set(hot[hot >= 2].index)
    cov = g[g["gram"].isin(hot)].sort_values(["doc_id", "pos"])
    brk = (cov.groupby("doc_id")["pos"].diff() > 8).astype(int)
    cov = cov.assign(gid=brk.groupby(cov["doc_id"]).cumsum())
    spans = (
        cov.groupby(["doc_id", "gid"])["pos"]
        .agg(["min", "max"])
        .reset_index()
        .rename(columns={"min": "span_start"})
    )
    spans["span_end"] = spans["max"] + 7
    spans["span_tokens"] = spans["max"] + 8 - spans["span_start"]
    return spans[["doc_id", "span_start", "span_end", "span_tokens"]]


def curation_funnel_docs(dfs):
    """Eager-pandas curation funnel: URL canonical keep-first, exact
    content dedup, quality gate, hash subsample, chunk accounting."""
    import hashlib

    d = dfs["documents"][["doc_id", "text", "source"]].copy()
    url = (
        "HTTPS://WWW."
        + d["source"].astype(str)
        + ".Example.COM:443/p"
        + (d["doc_id"] % 7).astype(str)
        + "?utm_source=feed&b=2&a=1&id="
        + (d["doc_id"] % 5).astype(str)
        + "#frag"
    )
    u = url.str.replace(r"#.*$", "", regex=True)
    scheme = u.str.extract(r"^([A-Za-z][A-Za-z0-9+.\-]*)://", expand=False).str.lower()
    hostport = u.str.extract(r"^[^:]+://([^/?#]*)", expand=False).str.lower()
    rest = u.str.extract(r"^[^:]+://[^/?#]*(.*)$", expand=False)
    host = np.where(
        scheme == "https",
        hostport.str.replace(r":443$", "", regex=True),
        np.where(scheme == "http", hostport.str.replace(r":80$", "", regex=True), hostport),
    )
    path = rest.str.extract(r"^([^?]*)", expand=False).replace("", "/")
    qs = rest.str.extract(r"\?(.*)$", expand=False).fillna("")

    def canon_qs(q):
        ps = [
            p
            for p in q.split("&")
            if p and not re.match(r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|ref)=.*$", p)
        ]
        return "?" + "&".join(sorted(ps)) if ps else ""

    d["c"] = scheme + "://" + host + path + qs.map(canon_qs)
    norm = (
        d["text"].str.lower().str.replace(r"[^a-z0-9]+", " ", regex=True).str.strip()
    )
    d["k"] = norm.map(lambda s: hashlib.md5(s.encode()).hexdigest())
    tk = d["text"].str.lower().str.findall(r"[a-z0-9]+")
    d["n_toks"] = tk.str.len()
    d["mwl"] = tk.map(lambda t: sum(len(x) for x in t)) / d["n_toks"].clip(lower=1)
    d["url_ok"] = d["doc_id"] == d.groupby("c")["doc_id"].transform("min")
    first_exact = d[d["url_ok"]].groupby("k")["doc_id"].min()
    d["exact_ok"] = d["url_ok"] & (d["doc_id"] == d["k"].map(first_exact))
    d["quality_ok"] = d["exact_ok"] & (d["n_toks"] >= 20) & (d["mwl"] < 12)
    h = (d["doc_id"].astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    d["sample_ok"] = d["quality_ok"] & ((h % np.uint64(10000)) < 8000)
    d["n_chunks"] = np.where(
        d["sample_ok"] & (d["n_toks"] > 0), (d["n_toks"] - 1) // 24 + 1, 0
    )
    return pd.DataFrame(
        {
            "stage": range(6),
            "stage_name": ["input", "url_dedup", "exact_dedup", "quality_gate", "subsample", "chunks"],
            "n_rows": [
                len(d),
                int(d["url_ok"].sum()),
                int(d["exact_ok"].sum()),
                int(d["quality_ok"].sum()),
                int(d["sample_ok"].sum()),
                int(d["n_chunks"].sum()),
            ],
        }
    )


QUERIES["label_propagation_communities"] = label_propagation_communities
QUERIES["deterministic_walks_supplier"] = deterministic_walks_supplier
QUERIES["substring_dup_spans"] = substring_dup_spans
QUERIES["curation_funnel_docs"] = curation_funnel_docs




# ---- round-5 additions -----------------------------------------------


def cdc_chunk_dedup(dfs):
    """Eager-pandas content-defined chunking + duplicated-chunk stats
    (word-level rolling hash, same constants as the Spark op)."""
    import hashlib

    P, B, W, D = 2**31 - 1, 131, 4, 16
    pw = [pow(B, j, P) for j in range(W)]
    from collections import Counter, defaultdict

    copies = Counter()
    docs_per = defaultdict(set)
    tok_lens = {}
    docs = dfs["documents"][["doc_id", "text"]]
    for doc_id, text in zip(docs["doc_id"].values, docs["text"].values):
        t = re.findall(r"[a-z0-9]+", text.lower())
        n = len(t)
        if n == 0:
            continue
        wh = []
        for w in t:
            acc = 0
            for ch in w:
                acc = (acc * B + ord(ch)) % P
            wh.append(acc)
        ends = [
            p
            for p in range(W - 1, n)
            if sum(wh[p - j] * pw[j] % P for j in range(W)) % P % D == 0
        ]
        if not ends or ends[-1] != n - 1:
            ends.append(n - 1)
        start = 0
        for e in ends:
            key = hashlib.md5(" ".join(t[start : e + 1]).encode()).hexdigest()
            copies[key] += 1
            docs_per[key].add(doc_id)
            tok_lens[key] = e + 1 - start
            start = e + 1
    return pd.DataFrame(
        [
            (k, tok_lens[k], c, len(docs_per[k]))
            for k, c in copies.items()
            if len(docs_per[k]) >= 2
        ],
        columns=["chunk_md5", "n_tokens", "n_copies", "n_docs"],
    )


def rake_keywords_docs(dfs):
    """Eager-pandas RAKE: stopword-split phrases, degree/frequency
    word stats, integer-scaled phrase scores."""
    from collections import Counter

    STOPS = {
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
        "for", "with", "at", "by", "from", "as", "it", "this", "that",
    }
    SCALE = 10**6
    phrases = Counter()
    docs = dfs["documents"][["doc_id", "text"]]
    for text in docs["text"].values:
        t = re.findall(r"[a-z0-9]+", text.lower())
        cur = []
        for w in t + ["the"]:  # sentinel flush
            if w in STOPS:
                if cur and len(cur) <= 4:
                    phrases[" ".join(cur)] += 1
                cur = []
            else:
                cur.append(w)
    freq, deg = Counter(), Counter()
    for ph, c in phrases.items():
        ws = ph.split(" ")
        for w in ws:
            freq[w] += c
            deg[w] += c * len(ws)
    rows = [
        (ph, len(ph.split(" ")), c,
         sum((deg[w] * SCALE) // freq[w] for w in ph.split(" ")))
        for ph, c in phrases.items()
    ]
    return pd.DataFrame(
        rows, columns=["phrase", "n_words", "n_occurrences", "score_scaled"]
    )


def link_prediction_parts(dfs):
    """Eager-pandas link prediction over the recurring-pair part
    graph: adjacency dicts + wedge enumeration."""
    from collections import defaultdict, Counter

    li = dfs["lineitem"][["l_orderkey", "l_partkey"]]
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    cnt = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    edges = set(cnt[cnt >= 2].index)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    S = 10**9
    cn, ra = Counter(), Counter()
    for z, nbrs in adj.items():
        ns = sorted(nbrs)
        share = S // len(ns)
        for i, u in enumerate(ns):
            for v in ns[i + 1 :]:
                cn[(u, v)] += 1
                ra[(u, v)] += share
    rows = [
        (u, v, c, len(adj[u]) * len(adj[v]), ra[(u, v)])
        for (u, v), c in cn.items()
        if c >= 2 and (u, v) not in edges
    ]
    return pd.DataFrame(
        rows,
        columns=["u", "v", "common_neighbors", "preferential_attachment", "ra_scaled"],
    )


QUERIES["cdc_chunk_dedup"] = cdc_chunk_dedup
QUERIES["rake_keywords_docs"] = rake_keywords_docs
QUERIES["link_prediction_parts"] = link_prediction_parts


# ---- round-6 additions: wave-8-15 families (VERDICT r5 ask #2) -------


def hits_supplier_graph(dfs):
    """Eager-pandas HITS twin (2 rounds, 10^6 L∞ renorm, integer
    floor division — mirrors plans/queries.py _hits_oracle(2))."""
    S = 10**6
    o = dfs["orders"][["o_orderkey", "o_custkey"]]
    l = dfs["lineitem"][["l_orderkey", "l_suppkey"]]
    p = o.merge(l, left_on="o_orderkey", right_on="l_orderkey")
    pairs = pd.DataFrame(
        {"src": p["o_custkey"] * 2, "dst": p["l_suppkey"] * 2 + 1}
    ).drop_duplicates()
    nodes = pd.unique(pd.concat([pairs["src"], pairs["dst"]], ignore_index=True))
    h = pd.Series(S, index=nodes, dtype="int64")
    a = pd.Series(dtype="int64")
    for _ in range(2):
        araw = (
            pairs.assign(hv=h.reindex(pairs["src"]).to_numpy())
            .groupby("dst")["hv"]
            .sum()
            .astype("int64")
        )
        a = (araw * S) // max(int(araw.max()), 1)
        hraw = (
            pairs.assign(av=a.reindex(pairs["dst"]).to_numpy())
            .groupby("src")["av"]
            .sum()
            .astype("int64")
        )
        h = (hraw * S) // max(int(hraw.max()), 1)
    return pd.DataFrame(
        {
            "node": nodes,
            "hub_scaled": h.reindex(nodes).fillna(0).astype("int64").to_numpy(),
            "auth_scaled": a.reindex(nodes).fillna(0).astype("int64").to_numpy(),
        }
    )


def kmeans_lloyd_portable(dfs):
    """numpy Lloyd twin: k=8 smallest-vid seeds, 2 rounds, int64
    floor(x*1024)+1024 coords, argmin ties to smallest cluster id,
    integer-division centroid means (mirrors operators/ml.py)."""
    emb = dfs["embeddings"].sort_values("vec_id")
    X = np.floor(np.stack(emb["embedding"].to_numpy()).astype("float64") * 1024).astype(
        "int64"
    ) + 1024
    vids = emb["vec_id"].to_numpy()
    seed_ids = vids[:8]
    C = X[:8].copy()
    labels = None
    dists = None
    for _ in range(2):
        # (n, 8) int64 distances; argmin picks the FIRST min — C rows
        # are ordered by ascending seed id, matching the tie-break
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        labels = d2.argmin(axis=1)
        dists = d2[np.arange(len(X)), labels]
        newC = np.zeros_like(C)
        for ci in range(8):
            members = X[labels == ci]
            if len(members):
                newC[ci] = members.sum(axis=0) // len(members)
            else:
                newC[ci] = C[ci]
        C = newC
    out = []
    for ci in range(8):
        mask = labels == ci
        if mask.any():
            out.append(
                (
                    int(seed_ids[ci]),
                    int(mask.sum()),
                    int(dists[mask].sum()),
                    int(C[ci].sum()),
                )
            )
    return pd.DataFrame(
        out, columns=["cluster", "n_members", "inertia", "centroid_sum"]
    )


def mann_kendall_user_values(dfs):
    """Per-user Mann-Kendall S + tie-corrected Var·18 + z, numpy
    O(n²) per bounded series (mirrors operators/stats.py)."""
    ev = dfs["events"][["user_id", "ts", "event_id", "value"]].sort_values(
        ["user_id", "ts", "event_id"]
    )
    rows = []
    for uid, g in ev.groupby("user_id", sort=False):
        v = g["value"].to_numpy()
        n = len(v)
        diff = v[None, :] - v[:, None]
        s = int(np.sign(np.triu(diff, k=1)).sum())
        _, counts = np.unique(v, return_counts=True)
        tie = int(sum(t * (t - 1) * (2 * t + 5) for t in counts if t > 1))
        var18 = n * (n - 1) * (2 * n + 5) - tie
        if var18 == 0 or s == 0:
            z = 0.0
        elif s > 0:
            z = (s - 1) / np.sqrt(var18 / 18.0)
        else:
            z = (s + 1) / np.sqrt(var18 / 18.0)
        rows.append((uid, n, s, var18, z))
    return pd.DataFrame(rows, columns=["user_id", "n", "s_stat", "var_x18", "z"])


def cramers_v_priority_status(dfs):
    """Integer-quantized chi² / Cramér's V over the priority×status
    contingency table (mirrors operators/stats.py
    cramers_v_quantized, scale=1000)."""
    o = dfs["orders"]
    cells = (
        o.groupby(["o_orderpriority", "o_orderstatus"]).size().astype("int64")
    )
    n = int(cells.sum())
    rt = cells.groupby(level=0).sum()
    ct = cells.groupby(level=1).sum()
    r, c = len(rt), len(ct)
    chi2_xscale = 0
    for rv, rtot in rt.items():
        for cv, ctot in ct.items():
            obs = int(cells.get((rv, cv), 0))
            eq = (int(rtot) * int(ctot)) // n
            d = max(eq, 1)
            dd = (obs - eq) * (obs - eq)
            chi2_xscale += (dd // d) * 1000 + (dd % d) * 1000 // d
    k = min(r - 1, c - 1)
    v = 0.0 if k <= 0 else float(np.sqrt(chi2_xscale / (1000.0 * n * k)))
    return pd.DataFrame(
        [(n, r, c, chi2_xscale, v)],
        columns=["n", "n_rowcats", "n_colcats", "chi2_xscale", "cramers_v"],
    )


def decision_stump_totalprice(dfs):
    """Histogram best-Gini-split twin (mirrors operators/ml.py
    decision_stump_binned, 256 bins, urgent-order label)."""
    o = dfs["orders"]
    val = o["o_totalprice"].to_numpy(dtype="float64")
    y = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).to_numpy(dtype="int64")
    lo, hi = float(val.min()), float(val.max())
    width = (hi - lo) / 256.0
    bucket = np.clip(np.floor((val - lo) / width).astype("int64"), 0, 255)
    pos = np.bincount(bucket, weights=y, minlength=256).astype("int64")
    neg = np.bincount(bucket, weights=1 - y, minlength=256).astype("int64")
    present = np.where((pos + neg) > 0)[0]
    pl = np.cumsum(pos[present])
    nl = np.cumsum(neg[present])
    tp, tn = int(pos.sum()), int(neg.sum())
    pr, nr = tp - pl, tn - nl
    tl, tr = pl + nl, pr + nr
    ok = (tl > 0) & (tr > 0)
    score = np.where(
        ok, (pl * nl) / np.maximum(tl, 1) + (pr * nr) / np.maximum(tr, 1), np.inf
    )
    best = int(np.lexsort((present, score))[0])
    b = int(present[best])
    return pd.DataFrame(
        [
            (
                b,
                lo + (b + 1) * width,
                int(pl[best]),
                int(nl[best]),
                int(pr[best]),
                int(nr[best]),
                float(score[best]),
            )
        ],
        columns=[
            "split_bucket",
            "split_value",
            "pos_left",
            "neg_left",
            "pos_right",
            "neg_right",
            "gini_score",
        ],
    )


QUERIES["hits_supplier_graph"] = hits_supplier_graph
QUERIES["kmeans_lloyd_portable"] = kmeans_lloyd_portable
QUERIES["mann_kendall_user_values"] = mann_kendall_user_values
QUERIES["cramers_v_priority_status"] = cramers_v_priority_status
QUERIES["decision_stump_totalprice"] = decision_stump_totalprice




# ---- round-6 additions: MST, DBSCAN, Jaro-Winkler, ALS, IBLT --------


def _mix32_np(x, salt, k=0):
    """Vectorized twin of operators.graph._portable_mix32."""
    x = np.asarray(x, dtype=np.uint64)
    s = (x % 4294967296 + (salt % 4294967296) * 40503 + k * 73244475) % 4294967296
    s = ((s ^ (s >> np.uint64(16))) * 73244475) % 4294967296
    return (s ^ (s >> np.uint64(16))).astype(np.int64)


def _part_pairs(dfs):
    li = dfs["lineitem"][["l_orderkey", "l_partkey"]]
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    cnt = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    cnt = cnt[cnt >= 2]
    return [(a, b, 1000 - int(n)) for (a, b), n in cnt.items()]


def mst_parts_forest(dfs):
    """Eager Kruskal with union-find over the recurring-pair part
    graph — the single-node twin of the distributed Boruvka rounds
    (same (w, a, b) tie-break => identical forest)."""
    edges = sorted((w, a, b) for a, b, w in _part_pairs(dfs))
    parent = {}

    def find(v):
        r = v
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(v, v) != v:
            parent[v], v = r, parent[v]
        return r

    out = []
    for w, a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out.append((a, b, w))
    return out


def dbscan_customer_sites(dfs):
    """Eager grid DBSCAN (same planted layout, same min-label
    border/cluster rules)."""
    ck = dfs["customer"]["c_custkey"].values.astype(np.int64)
    centers = max(len(ck) // 44, 1)
    kk = ck % centers
    scatter = ck % 9 == 0
    x = (_mix32_np(kk, 11) % 1000) * 50000 + 10000 + np.where(
        scatter, _mix32_np(ck, 15) % 6000, _mix32_np(ck, 13) % 1200
    )
    y = (_mix32_np(kk, 12) % 1000) * 50000 + 10000 + np.where(
        scatter, _mix32_np(ck, 16) % 6000, _mix32_np(ck, 14) % 1200
    )
    eps, min_pts = 2500, 10
    import collections

    cell = collections.defaultdict(list)
    for idx in range(len(ck)):
        cell[(x[idx] // eps, y[idx] // eps)].append(idx)
    nbrs = {}
    for (cx, cy), members in cell.items():
        cand = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cand.extend(cell.get((cx + dx, cy + dy), ()))
        ca = np.asarray(cand)
        for idx in members:
            d2 = (x[ca] - x[idx]) ** 2 + (y[ca] - y[idx]) ** 2
            nbrs[idx] = ca[d2 <= eps * eps]
    core = {i for i, nb in nbrs.items() if len(nb) >= min_pts}
    # CC over core graph: BFS with min-id labels
    label = {}
    for seed in sorted(core, key=lambda i: ck[i]):
        if seed in label:
            continue
        comp, stack = [], [seed]
        seen = {seed}
        while stack:
            v = stack.pop()
            comp.append(v)
            for w in nbrs[v]:
                w = int(w)
                if w in core and w not in seen:
                    seen.add(w)
                    stack.append(w)
        m = min(ck[v] for v in comp)
        for v in comp:
            label[v] = m
    out = {}
    for i in range(len(ck)):
        if i in core:
            out[int(ck[i])] = ("core", int(label[i]))
        else:
            cl = [label[int(w)] for w in nbrs.get(i, ()) if int(w) in core]
            if cl:
                out[int(ck[i])] = ("border", int(min(cl)))
            else:
                out[int(ck[i])] = ("noise", -1)
    return out


def _jw_micro(s1, s2):
    L1, L2 = len(s1), len(s2)
    if L1 == 0 or L2 == 0:
        return 0
    w = max(max(L1, L2) // 2 - 1, 0)
    used = [False] * L2
    mi, mj = [], []
    for i in range(L1):
        for j in range(max(0, i - w), min(L2 - 1, i + w) + 1):
            if not used[j] and s2[j] == s1[i]:
                used[j] = True
                mi.append(i)
                mj.append(j)
                break
    m = len(mi)
    if m == 0:
        return 0
    mjs = sorted(mj)
    t = sum(1 for k in range(m) if s1[mi[k]] != s2[mjs[k]])
    A = 2 * m * m * L2 + 2 * m * m * L1 + (2 * m - t) * L1 * L2
    B = 6 * m * L1 * L2
    l = 0
    for k in range(min(4, L1, L2)):
        if s1[k] != s2[k]:
            break
        l += 1
    return (10 * A + l * (B - A)) * 1000000 // (10 * B)


def jaro_winkler_part_names(dfs):
    """Eager twin of the registered pair synthesis + exact JW."""
    # part table is not in the default load set; read lazily once
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    p = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    k = p["p_partkey"].values.astype(np.int64)
    nm = p["p_name"].str.slice(0, 30).tolist()
    q = _mix32_np(k, 21) % (np.array([len(s) for s in nm]) - 1)
    pert = []
    for s, qi, ki in zip(nm, q, k):
        qi = int(qi)
        t = s[:qi] + s[qi + 1 : qi + 2] + s[qi : qi + 1] + s[qi + 2 :]
        if ki % 4 == 0:
            t = t[:-1]
        pert.append(t)
    by_key = dict(zip(k.tolist(), zip(nm, pert)))
    out = {}
    for ki in k.tolist():
        out[(ki, "self")] = _jw_micro(by_key[ki][0], by_key[ki][1])
        if ki % 2 == 1 and ki + 1 in by_key:
            out[(ki, "next")] = _jw_micro(by_key[ki][0], by_key[ki + 1][1])
    return out


def als_rank1_factors(dfs):
    """Eager integer rank-1 ALS (2 rounds), same dyadic arithmetic."""
    o = dfs["orders"][["o_orderkey", "o_custkey"]]
    li = dfs["lineitem"][["l_orderkey", "l_partkey", "l_quantity"]]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    r = (
        j.assign(r=j["l_quantity"].astype(np.int64))
        .groupby(["o_custkey", "l_partkey"])["r"]
        .sum()
        .reset_index()
    )
    r.columns = ["u", "i", "r"]
    y = pd.Series(1 << 20, index=np.unique(r["i"].values), dtype=np.int64)
    x = None

    def half(side, f_key, f):
        fv = f.loc[r[f_key]].values
        num = pd.Series(r["r"].values * fv, index=r[side].values).groupby(level=0).sum() * (1 << 20)
        den = pd.Series(fv * fv, index=r[side].values).groupby(level=0).sum() // (1 << 20)
        return (num // den.clip(lower=1)).astype(np.int64)

    for _ in range(2):
        x = half("u", "i", y)
        y = half("i", "u", x)
    return x, y


def iblt_set_reconcile(dfs):
    """Eager set-difference twin: the single-node answer the IBLT
    reconciliation converges to (pandas index anti-joins)."""
    keys = dfs["orders"]["o_orderkey"]
    left = set(keys[keys % 7 != 0].tolist())
    right = set(keys[keys % 11 != 0].tolist())
    return sorted((k, "left_only") for k in left - right) + sorted(
        (k, "right_only") for k in right - left
    )


QUERIES["mst_parts_forest"] = mst_parts_forest
QUERIES["dbscan_customer_sites"] = dbscan_customer_sites
QUERIES["jaro_winkler_part_names"] = jaro_winkler_part_names
QUERIES["als_rank1_factors"] = als_rank1_factors
QUERIES["iblt_set_reconcile"] = iblt_set_reconcile


if __name__ == "__main__":
    main()
