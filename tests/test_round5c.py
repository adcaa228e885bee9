"""Round-5c additions: skyline, Benford, JS-divergence, Bollinger bands,
RSI — each pinned against a from-scratch Python/pandas twin on the smoke
fixture (the DuckDB twin runs in the oracle differential)."""

from __future__ import annotations

import math

from tests.conftest import SF_SMOKE  # noqa: F401


def _daily_qty(spark):
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_shipdate", "l_quantity"
    ).collect()
    per_day: dict = {}
    for r in rows:
        d = r.l_shipdate.date()
        per_day[d] = per_day.get(d, 0) + int(r.l_quantity)
    return sorted(per_day.items())


# ---------------------------------------------------------------------------
# operators/frontier.py — skyline vs the O(n²) brute-force dominance check.


def test_skyline_vs_bruteforce(spark):
    from flink_streaming_gnn_spark.operators.frontier import olap_skyline_pareto
    from flink_streaming_gnn_spark.sources.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey", "l_quantity")
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_retailprice")
    qty = {}
    for r in li.collect():
        qty[r.l_partkey] = qty.get(r.l_partkey, 0) + int(r.l_quantity)
    price = {r.p_partkey: r.p_retailprice for r in part.collect()}
    pts = {}
    for pk, q in qty.items():
        pts.setdefault((price[pk], q), []).append(pk)
    keys = list(pts)
    sky = {
        (x, y)
        for (x, y) in keys
        if not any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y)) for (x2, y2) in keys
        )
    }
    got = olap_skyline_pareto(spark, SF_SMOKE).collect()
    assert {(r.price, r.total_qty) for r in got} == sky
    for r in got:
        members = pts[(r.price, r.total_qty)]
        assert r.n_parts == len(members)
        assert r.first_part == min(members)
    # the sweep result is price-sorted and the frontier strictly improves
    for a, b in zip(got, got[1:]):
        assert a.price < b.price and a.total_qty < b.total_qty


# ---------------------------------------------------------------------------
# operators/frontier.py — Benford digits vs a direct Python census.


def test_benford_vs_python(spark):
    from flink_streaming_gnn_spark.operators.frontier import dq_benford_firstdigit
    from flink_streaming_gnn_spark.sources.tables import load_table

    prices = [
        r.l_extendedprice
        for r in load_table(spark, SF_SMOKE, "lineitem").select("l_extendedprice").collect()
    ]
    counts: dict[int, int] = {}
    for p in prices:
        d = int(str(int(math.floor(p)))[0])
        counts[d] = counts.get(d, 0) + 1
    n = len(prices)
    got = dq_benford_firstdigit(spark, SF_SMOKE).collect()
    assert [r.digit for r in got] == sorted(counts)
    chi2 = 0.0
    for r in got:
        assert r.n_obs == counts[r.digit]
        e = n * math.log10(1 + 1 / r.digit)
        assert abs(r.expected_n - round(e, 4)) < 1e-6
        assert abs(r.chi2_contrib - round((counts[r.digit] - e) ** 2 / e, 6)) < 1e-6
        chi2 += round((counts[r.digit] - e) ** 2 / e, 6)
    assert all(abs(r.chi2_total - round(chi2, 6)) < 1e-6 for r in got)


# ---------------------------------------------------------------------------
# operators/frontier.py — JSD vs a direct Python computation, plus the
# mathematical bounds 0 ≤ JSD ≤ 1 bit.


def test_js_divergence_vs_python(spark):
    from datetime import datetime

    from flink_streaming_gnn_spark.operators.frontier import (
        JSD_SPLIT,
        dq_js_divergence,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    split = datetime.fromisoformat(JSD_SPLIT)
    rows = load_table(spark, SF_SMOKE, "events").select("ts", "event_type").collect()
    a: dict[str, int] = {}
    b: dict[str, int] = {}
    for r in rows:
        side = a if r.ts < split else b
        side[r.event_type] = side.get(r.event_type, 0) + 1
    na, nb = sum(a.values()), sum(b.values())
    jsd = 0.0
    for t in set(a) | set(b):
        p, q = a.get(t, 0) / na, b.get(t, 0) / nb
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log2(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log2(q / m)
    row = dq_js_divergence(spark, SF_SMOKE).collect()[0]
    assert (row.n_first_half, row.n_second_half) == (na, nb)
    assert abs(row.jsd_bits - round(jsd, 6)) < 1e-6
    assert 0.0 <= row.jsd_bits <= 1.0


# ---------------------------------------------------------------------------
# operators/techind.py — Bollinger bands and RSI vs pandas rolling twins.


def test_bollinger_vs_pandas(spark):
    import pandas as pd

    from flink_streaming_gnn_spark.operators.techind import (
        BOLL_N,
        ts_bollinger_bands,
    )

    daily = _daily_qty(spark)
    s = pd.Series([q for _, q in daily], dtype="float64")
    ma = s.rolling(BOLL_N).mean()
    sd = s.rolling(BOLL_N).std(ddof=1)
    got = ts_bollinger_bands(spark, SF_SMOKE).collect()
    assert len(got) == len(daily) - (BOLL_N - 1)
    for i, r in enumerate(got):
        j = i + BOLL_N - 1
        assert r.day.date() == daily[j][0] and r.qty == daily[j][1]
        assert abs(r.ma - round(ma[j], 4)) < 1e-6
        assert abs(r.upper_band - round(ma[j] + 2 * sd[j], 4)) < 1e-6
        assert abs(r.lower_band - round(ma[j] - 2 * sd[j], 4)) < 1e-6
        want = (
            "up" if r.qty > r.upper_band
            else "down" if r.qty < r.lower_band
            else "in_band"
        )
        assert r.breakout == want


def test_rsi_vs_python(spark):
    from flink_streaming_gnn_spark.operators.techind import RSI_N, ts_rsi

    daily = _daily_qty(spark)
    deltas = [
        (daily[i][0], daily[i][1], daily[i][1] - daily[i - 1][1])
        for i in range(1, len(daily))
    ]
    got = ts_rsi(spark, SF_SMOKE).collect()
    assert len(got) == len(deltas) - (RSI_N - 1)
    for i, r in enumerate(got):
        j = i + RSI_N - 1
        day, qty, delta = deltas[j]
        assert (r.day.date(), r.qty, r.delta) == (day, qty, delta)
        win = [d for _, _, d in deltas[j - RSI_N + 1 : j + 1]]
        sg = sum(d for d in win if d > 0)
        sl = sum(-d for d in win if d < 0)
        want = 50.0 if sg + sl == 0 else round(100.0 * sg / (sg + sl), 6)
        assert abs(r.rsi - want) < 1e-6
        assert 0.0 <= r.rsi <= 100.0


def test_round5c_keys_registered():
    from flink_streaming_gnn_spark import registry

    q = registry.all_queries()
    o = registry.all_oracle_sql()
    for k in (
        "olap_skyline_pareto",
        "dq_benford_firstdigit",
        "dq_js_divergence",
        "ts_bollinger_bands",
        "ts_rsi",
    ):
        assert k in q and k in o


# ---------------------------------------------------------------------------
# llm/dsir.py — DSIR importance weights vs a from-scratch Python twin
# (hashed-feature LMs with add-1 smoothing, md5-nibble bucketing).


def test_dsir_vs_python(spark):
    import hashlib
    import math as m
    from collections import Counter, defaultdict

    from flink_streaming_gnn_spark.llm.dsir import (
        N_BUCKETS,
        TARGET_LANG,
        TOP_K,
        mix_dsir_importance,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    def bucket(tok: str) -> int:
        hx = hashlib.md5(tok.encode()).hexdigest()
        return (int(hx[6], 16) * 16 + int(hx[7], 16)) % N_BUCKETS

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    c_t, c_r = Counter(), Counter()
    per_doc = defaultdict(Counter)
    for d in docs:
        for tok in d.text.split(" "):
            if not tok:
                continue
            b = bucket(tok)
            if d.lang == TARGET_LANG:
                c_t[b] += 1
            else:
                c_r[b] += 1
                per_doc[d.doc_id][b] += 1
    n_t, n_r = sum(c_t.values()), sum(c_r.values())
    want = {}
    for doc_id, buckets in per_doc.items():
        w = sum(
            n
            * (
                m.log((c_t[b] + 1.0) / (n_t + N_BUCKETS))
                - m.log((c_r[b] + 1.0) / (n_r + N_BUCKETS))
            )
            for b, n in buckets.items()
        )
        want[doc_id] = (sum(buckets.values()), w)
    top = sorted(want.items(), key=lambda kv: (-kv[1][1], kv[0]))[:TOP_K]
    got = mix_dsir_importance(spark, SF_SMOKE).collect()
    assert len(got) == min(TOP_K, len(want))
    assert [r.doc_id for r in got] == [doc_id for doc_id, _ in top]
    for r in got:
        n_tokens, w = want[r.doc_id]
        assert r.n_tokens == n_tokens
        assert abs(r.dsir_weight - round(w, 6)) < 1e-6
    # weights must separate: a weight exists for every non-target doc
    assert len(want) == sum(1 for d in docs if d.lang != TARGET_LANG)


# ---------------------------------------------------------------------------
# llm/stump.py — decision stump vs an exhaustive numpy split search.


def test_decision_stump_vs_numpy(spark):
    import numpy as np

    from flink_streaming_gnn_spark.llm.stump import N_BINS, ml_decision_stump
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "embeddings").select(
        "embedding", "label"
    ).collect()
    x = np.array([float(r.embedding[0]) for r in rows])
    y = np.array([r.label for r in rows])
    lo, hi = x.min(), x.max()
    bins = np.minimum(
        np.floor((x - lo) / (hi - lo) * N_BINS).astype(int), N_BINS - 1
    )
    best = None
    for b in range(N_BINS - 1):
        left = y[bins <= b]
        right = y[bins > b]
        if len(left) == 0 or len(right) == 0:
            continue

        def side(arr):
            counts = np.bincount(arr, minlength=10)
            return len(arr) - (counts.astype(float) ** 2).sum() / len(arr)

        g = (side(left) + side(right)) / len(y)
        if best is None or g < best[0] - 1e-12:
            counts_l = np.bincount(left, minlength=10)
            counts_r = np.bincount(right, minlength=10)
            best = (
                g,
                b,
                len(left),
                len(right),
                int(np.argmax(counts_l)),
                int(np.argmax(counts_r)),
            )
    g, b, n_left, n_right, lmaj, rmaj = best
    row = ml_decision_stump(spark, SF_SMOKE).collect()[0]
    assert row.split_bin == b
    assert (row.n_left, row.n_right) == (n_left, n_right)
    assert abs(row.weighted_gini - round(g, 6)) < 1e-6
    assert (row.left_majority, row.right_majority) == (lmaj, rmaj)
    assert abs(row.threshold - round(lo + (b + 1) * (hi - lo) / N_BINS, 6)) < 1e-6


# ---------------------------------------------------------------------------
# sources/binaryfiles.py — the binary round-trip must preserve bytes.


def test_binaryfile_roundtrip_checksums(spark):
    import hashlib

    from flink_streaming_gnn_spark.sources.binaryfiles import (
        N_FILES,
        source_binaryfile_ingest,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    want = {
        r.doc_id: (len(r.text.encode()), hashlib.md5(r.text.encode()).hexdigest())
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter(f"doc_id < {N_FILES}")
        .select("doc_id", "text")
        .collect()
    }
    got = source_binaryfile_ingest(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        n_bytes, md5 = want[r.doc_id]
        assert (r.n_bytes, r.content_md5) == (n_bytes, md5)


# ---------------------------------------------------------------------------
# operators/behavior.py — position attribution vs a sequential Python
# journey replay; conservation: every purchase's value is fully credited.


def test_attribution_position_vs_python(spark):
    from collections import defaultdict

    from flink_streaming_gnn_spark.operators.behavior import (
        olap_attribution_position,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    want_n: dict[str, int] = defaultdict(int)
    want_v: dict[str, float] = defaultdict(float)
    total_purchase = 0.0
    for hist in by_user.values():
        hist.sort(key=lambda r: (r.ts, r.event_id))
        journey: list = []
        for r in hist:
            if r.event_type != "purchase":
                journey.append(r.event_type)
                continue
            total_purchase += r.value
            k = len(journey)
            if k == 0:
                want_n["direct"] += 1
                want_v["direct"] += r.value
            elif k == 1:
                want_n[journey[0]] += 1
                want_v[journey[0]] += r.value
            elif k == 2:
                for c in journey:
                    want_n[c] += 1
                    want_v[c] += r.value / 2
            else:
                for i, c in enumerate(journey):
                    want_n[c] += 1
                    if i in (0, k - 1):
                        want_v[c] += 0.4 * r.value
                    else:
                        want_v[c] += 0.2 * r.value / (k - 2)
            journey = []
    got = {r.channel: r for r in olap_attribution_position(spark, SF_SMOKE).collect()}
    assert set(got) == set(want_n)
    for c in want_n:
        assert got[c].n_credited == want_n[c]
        assert abs(got[c].attributed_value - round(want_v[c], 2)) < 1e-6
    assert abs(sum(want_v.values()) - total_purchase) < 1e-6  # conservation


def test_round5c_more_keys_registered():
    from flink_streaming_gnn_spark import registry

    q = registry.all_queries()
    o = registry.all_oracle_sql()
    for k in (
        "mix_dsir_importance",
        "ml_decision_stump",
        "source_binaryfile_ingest",
        "olap_attribution_position",
    ):
        assert k in q and k in o


# ---------------------------------------------------------------------------
# operators/journey.py — funnel time-to-convert vs a numpy twin
# (numpy linear-interpolation percentile == Spark exact percentile ==
# DuckDB quantile_cont).


def test_funnel_ttc_vs_numpy(spark):
    from collections import defaultdict

    import numpy as np

    from flink_streaming_gnn_spark.operators.journey import (
        STAGES,
        funnel_time_to_convert,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    firsts: dict = defaultdict(dict)
    for r in rows:
        cur = firsts[r.user_id].get(r.event_type)
        if cur is None or r.ts < cur:
            firsts[r.user_id][r.event_type] = r.ts
    want: dict = {}
    for a, b in zip(STAGES, STAGES[1:]):
        deltas = [
            (u[b] - u[a]).total_seconds()
            for u in firsts.values()
            if a in u and b in u and u[b] > u[a]
        ]
        if deltas:
            want[f"{a}->{b}"] = (
                len(deltas),
                float(np.percentile(deltas, 50)),
                float(np.percentile(deltas, 90)),
                float(np.mean(deltas)),
            )
    got = {r.pair: r for r in funnel_time_to_convert(spark, SF_SMOKE).collect()}
    assert set(got) == set(want)
    for pair, (n, med, p90, mean) in want.items():
        r = got[pair]
        assert r.n_users == n
        assert abs(r.median_sec - round(med, 6)) < 1e-5
        assert abs(r.p90_sec - round(p90, 6)) < 1e-5
        assert abs(r.mean_sec - round(mean, 6)) < 1e-5


# ---------------------------------------------------------------------------
# llm/mmr.py — MMR diversification vs an independent numpy greedy over
# raw parquet (no Spark in the twin), plus set invariants.


def test_mmr_vs_numpy_greedy(spark):
    import numpy as np
    import pandas as pd

    from flink_streaming_gnn_spark.llm.mmr import (
        K,
        LAM,
        POOL,
        QUERY_ID,
        simsearch_mmr_diversify,
    )
    from flink_streaming_gnn_spark.sources.tables import table_path

    pdf = pd.read_parquet(table_path(SF_SMOKE, "embeddings"))
    vecs = {
        int(r.vec_id): np.asarray(list(r.embedding), dtype=np.float64)
        for r in pdf.itertuples()
    }
    q = vecs[QUERY_ID]

    def cos6(a, b):
        return round(float(a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b)), 6)

    rel = {i: cos6(v, q) for i, v in vecs.items() if i != QUERY_ID}
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:POOL]
    chosen: list[int] = []
    want = []
    remaining = sorted(pool)
    for rank in range(1, K + 1):
        scores = {
            c: rel[c]
            if rank == 1
            else LAM * rel[c]
            - (1 - LAM) * max(cos6(vecs[c], vecs[s]) for s in chosen)
            for c in remaining
        }
        c = min(scores, key=lambda i: (-scores[i], i))
        want.append((rank, c, rel[c], round(scores[c], 6)))
        chosen.append(c)
        remaining.remove(c)
    got = simsearch_mmr_diversify(spark, SF_SMOKE).orderBy("rank").collect()
    assert [(r.rank, r.vec_id) for r in got] == [(w[0], w[1]) for w in want]
    for r, w in zip(got, want):
        assert abs(r.relevance - w[2]) < 1e-9
        # display rounding may differ by one 6-dp ulp when the raw score
        # lands exactly on a .5 decimal boundary (the oracle hash pins the
        # engine-exact value; the twin only checks the trajectory)
        assert abs(r.mmr_score - w[3]) < 1.1e-6
    # invariants: distinct picks; first pick is the most relevant candidate
    assert len({r.vec_id for r in got}) == K
    assert got[0].relevance == max(rel[i] for i in pool)


def test_round5c_journey_mmr_registered():
    from flink_streaming_gnn_spark import registry

    q = registry.all_queries()
    o = registry.all_oracle_sql()
    for k in ("funnel_time_to_convert", "simsearch_mmr_diversify"):
        assert k in q and k in o


# ---------------------------------------------------------------------------
# llm/multimodal.py — aHash fingerprints vs a loop-level Python twin
# (independent of the numpy grid indexing used by the implementation).


def test_image_ahash_vs_python(spark):
    from flink_streaming_gnn_spark.llm.multimodal import multimodal_image_ahash

    got = {r.doc_id: r for r in multimodal_image_ahash(spark, SF_SMOKE).collect()}
    assert len(got) >= 1
    for doc_id in list(got)[:50]:
        w, h = 8 + doc_id % 9, 8 + doc_id % 7
        lumas = []
        for i in range(8):
            for j in range(8):
                ys, xs = (i * h) // 8, (j * w) // 8
                r_ = (doc_id + 3 * ys + 5 * xs) % 256
                g_ = (doc_id + 3 * ys + 5 * xs + 11) % 256
                b_ = (doc_id + 3 * ys + 5 * xs + 22) % 256
                lumas.append(299 * r_ + 587 * g_ + 114 * b_)
        total = sum(lumas)
        bits = "".join("1" if 64 * l > total else "0" for l in lumas)
        r = got[doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.ahash_bits == bits
        assert r.n_set_bits == bits.count("1")
    # fingerprints discriminate: not all hashes identical
    assert len({r.ahash_bits for r in got.values()}) > 1


# ---------------------------------------------------------------------------
# operators/mlr.py — closed-form 2-feature OLS vs numpy lstsq.


def test_multiple_regression_vs_numpy(spark):
    from collections import defaultdict

    import numpy as np

    from flink_streaming_gnn_spark.operators.mlr import agg_multiple_regression
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    ).collect()
    acc = defaultdict(lambda: [0.0, 0.0, 0.0])
    for r in rows:
        a = acc[r.l_orderkey]
        a[0] += 1
        a[1] += r.l_quantity
        a[2] += r.l_extendedprice * (1 - r.l_discount)
    X = np.array([[1.0, a[0], a[1]] for a in acc.values()])
    y = np.array([a[2] for a in acc.values()])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r = agg_multiple_regression(spark, SF_SMOKE).collect()[0]
    assert r.n_orders == len(acc)
    assert abs(r.b0 - beta[0]) < 1e-3  # lstsq solves via SVD; closed form
    assert abs(r.b1 - beta[1]) < 1e-5  # agrees to numerical conditioning
    assert abs(r.b2 - beta[2]) < 1e-5
    assert abs(r.r2 - (1 - ss_res / ss_tot)) < 1e-6


# ---------------------------------------------------------------------------
# operators/mlr.py — path mining vs a sequential Python replay.


def test_path_mining_vs_python(spark):
    from collections import Counter, defaultdict

    from flink_streaming_gnn_spark.operators.mlr import (
        PATH_TOP_K,
        event_path_mining,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    counts: Counter = Counter()
    for hist in by_user.values():
        hist.sort(key=lambda r: (r.ts, r.event_id))
        types = [r.event_type for r in hist]
        for i in range(2, len(types)):
            counts[f"{types[i-2]}>{types[i-1]}>{types[i]}"] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOP_K]
    got = [(r.path, r.n) for r in event_path_mining(spark, SF_SMOKE).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# llm/matryoshka.py — truncation recall vs a numpy brute-force twin.


def test_matryoshka_recall_vs_numpy(spark):
    import numpy as np
    import pandas as pd

    from flink_streaming_gnn_spark.llm.matryoshka import (
        K,
        N_PROBES,
        TRUNC_DIMS,
        emb_matryoshka_recall,
    )
    from flink_streaming_gnn_spark.sources.tables import table_path

    pdf = pd.read_parquet(table_path(SF_SMOKE, "embeddings"))
    vecs = {
        int(r.vec_id): np.asarray(list(r.embedding), dtype=np.float64)
        for r in pdf.itertuples()
    }

    def topk(q, dims):
        scores = []
        for i, v in vecs.items():
            if i == q:
                continue
            a, b = vecs[q][:dims], v[:dims]
            c = round(float(a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b)), 6)
            scores.append((-c, i))
        return {i for _, i in sorted(scores)[:K]}

    got = {r.probe_id: r for r in emb_matryoshka_recall(spark, SF_SMOKE).collect()}
    assert set(got) == set(range(N_PROBES))
    for pid in range(0, N_PROBES, 7):  # spot-check every 7th probe
        want = len(topk(pid, 64) & topk(pid, TRUNC_DIMS))
        assert got[pid].n_common == want
        assert abs(got[pid].recall_at_k - want / K) < 1e-12
    # truncation must lose SOME neighbors somewhere (non-trivial metric)
    assert any(r.n_common < K for r in got.values())


# ---------------------------------------------------------------------------
# llm/matryoshka.py — image Hamming group pairs vs a Python brute force
# over all distinct hashes (no banding in the twin: zero-miss check).


def test_image_hamming_groups_vs_python(spark):
    from collections import defaultdict

    from flink_streaming_gnn_spark.llm.matryoshka import (
        HAM_T,
        dedup_image_hamming_pairs,
    )
    from flink_streaming_gnn_spark.llm.multimodal import multimodal_image_ahash

    rows = multimodal_image_ahash(spark, SF_SMOKE).collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r.ahash_bits].append(r.doc_id)
    reps = {bits: (min(ids), len(ids)) for bits, ids in groups.items()}
    want = set()
    items = list(reps.items())
    for i, (ba, (ra, na)) in enumerate(items):
        for bb, (rb, nb) in items[i + 1 :]:
            d = sum(1 for x, y in zip(ba, bb) if x != y)
            if d <= HAM_T:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                nlo, nhi = (na, nb) if ra < rb else (nb, na)
                want.add((lo, hi, nlo, nhi, d))
    got = {
        (r.rep_a, r.rep_b, r.n_docs_a, r.n_docs_b, r.hamming)
        for r in dedup_image_hamming_pairs(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert all(1 <= h <= HAM_T for *_, h in got)  # distinct hashes: never 0


# ---------------------------------------------------------------------------
# operators/pacf.py — Durbin–Levinson PACF vs a numeric numpy recursion
# (the implementation is symbolic; the twin recurses on values).


def test_pacf_vs_numpy_recursion(spark):
    import numpy as np

    from flink_streaming_gnn_spark.operators.pacf import (
        K_LAGS,
        ts_pacf_durbin_levinson,
    )

    daily = _daily_qty(spark)
    x = np.array([q for _, q in daily], dtype=np.float64)
    d = x - x.mean()
    c0 = float(d @ d)
    r = [float(d[k:] @ d[:-k]) / c0 for k in range(1, K_LAGS + 1)]
    phi = {(1, 1): r[0]}
    want = [r[0]]
    for k in range(2, K_LAGS + 1):
        num = r[k - 1] - sum(phi[(k - 1, j)] * r[k - j - 1] for j in range(1, k))
        den = 1 - sum(phi[(k - 1, j)] * r[j - 1] for j in range(1, k))
        kk = num / den
        phi[(k, k)] = kk
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - kk * phi[(k - 1, k - j)]
        want.append(kk)
    got = ts_pacf_durbin_levinson(spark, SF_SMOKE).orderBy("lag").collect()
    assert [g.lag for g in got] == list(range(1, K_LAGS + 1))
    for g, r_k, p_k in zip(got, r, want):
        assert abs(g.acf - r_k) < 1e-5
        assert abs(g.pacf - p_k) < 1e-5
    # PACF lag 1 must equal ACF lag 1 by definition
    assert abs(got[0].acf - got[0].pacf) < 1e-12


# ---------------------------------------------------------------------------
# graph/motifs.py — FFL / 3-cycle census vs the adjacency-matrix
# identities: FFL = sum((A @ A) * A), cycles = trace(A^3) / 3.


def test_motif_census_vs_adjacency_matrix(spark):
    import numpy as np

    from flink_streaming_gnn_spark.graph.edges import derive_vertex_embeddings
    from flink_streaming_gnn_spark.graph.motifs import graph_motif_ffl_cycle

    edges = {
        (r.src_v, r.dst_v)
        for r in derive_vertex_embeddings(spark, SF_SMOKE).collect()
        if r.src_v != r.dst_v
    }
    n = max(max(a, b) for a, b in edges) + 1
    A = np.zeros((n, n), dtype=np.int64)
    for a, b in edges:
        A[a, b] = 1
    A2 = A @ A
    want_ffl = int((A2 * A).sum())
    want_cyc = int(np.trace(A2 @ A)) // 3
    r = graph_motif_ffl_cycle(spark, SF_SMOKE).collect()[0]
    assert r.n_edges == len(edges)
    assert r.n_ffl == want_ffl
    assert r.n_cycle == want_cyc


# ---------------------------------------------------------------------------
# llm/sampling.py — A-ES weighted sample vs a Python twin, plus the
# statistical property that the sample over-represents long documents.


def test_weighted_ares_vs_python(spark):
    import hashlib
    import math as m

    from flink_streaming_gnn_spark.llm.sampling import (
        ARES_K,
        sample_weighted_ares,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    keys = []
    for r in docs:
        v = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        u = (v + 1) / 2**32
        keys.append((round(m.log(u) / r.n_chars, 12), -r.doc_id, r))
    keys.sort(reverse=True)
    want = [(k[2].doc_id, k[2].n_chars) for k in keys[:ARES_K]]
    got = sample_weighted_ares(spark, SF_SMOKE).orderBy("rk").collect()
    assert [(r.doc_id, r.n_chars) for r in got] == want
    assert [r.rk for r in got] == list(range(1, ARES_K + 1))
    # weighting property: the sample mean length exceeds the corpus mean
    corpus_mean = sum(r.n_chars for r in docs) / len(docs)
    sample_mean = sum(r.n_chars for r in got) / len(got)
    assert sample_mean > corpus_mean


# ---------------------------------------------------------------------------
# operators/inequality.py — Theil indices vs a direct Python computation
# and their mathematical bounds.


def test_theil_vs_python(spark):
    import math as m
    from collections import defaultdict

    from flink_streaming_gnn_spark.operators.inequality import agg_theil_index
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    ).collect()
    rev = defaultdict(float)
    for r in rows:
        rev[r.l_suppkey] += r.l_extendedprice * (1 - r.l_discount)
    xs = list(rev.values())
    mu = sum(xs) / len(xs)
    t = sum((x / mu) * m.log(x / mu) for x in xs) / len(xs)
    lmld = -sum(m.log(x / mu) for x in xs) / len(xs)
    r = agg_theil_index(spark, SF_SMOKE).collect()[0]
    assert r.n_suppliers == len(xs)
    assert abs(r.theil_t - t) < 1e-5
    assert abs(r.theil_l - lmld) < 1e-5
    assert 0.0 <= r.theil_t <= m.log(len(xs))
    assert r.theil_l >= 0.0


# ---------------------------------------------------------------------------
# llm/textstats.py — vocab richness vs a Counter twin.


def test_vocab_richness_vs_python(spark):
    from collections import Counter

    from flink_streaming_gnn_spark.llm.textstats import text_vocab_richness
    from flink_streaming_gnn_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    counts = Counter(t for d in docs for t in d.text.split(" ") if t)
    n_tokens = sum(counts.values())
    vocab = len(counts)
    hapax = sum(1 for c in counts.values() if c == 1)
    r = text_vocab_richness(spark, SF_SMOKE).collect()[0]
    assert (r.n_tokens, r.vocab, r.hapax_count) == (n_tokens, vocab, hapax)
    assert abs(r.type_token_ratio - round(vocab / n_tokens, 6)) < 1e-9
    assert abs(r.hapax_ratio - round(hapax / vocab, 6)) < 1e-9


# ---------------------------------------------------------------------------
# operators/techind.py — the Holt–Winters truncated filter must EQUAL the
# true sequential recursion (zero-initialized) on any series shorter than
# the truncation horizon K: truncation only bites beyond K taps, so this
# pins the companion-matrix derivation exactly.


def test_holt_winters_filter_equals_recursion(spark):
    from flink_streaming_gnn_spark.operators.techind import (
        HW_ALPHA,
        HW_BETA,
        HW_GAMMA,
        HW_K,
        HW_PERIOD,
        _hw_weights,
    )

    a, b, g, m = HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD
    xs = [float((7 * i * i + 3 * i) % 50 + (10 if i % m == 2 else 0)) for i in range(20)]
    assert len(xs) < HW_K
    # sequential zero-initialized recursion
    lvl, trd = 0.0, 0.0
    seas = [0.0] * m  # seas[j] = s_{t-1-j} ring (most recent first)
    got = []
    for x in xs:
        s_tm = seas[m - 1]
        new_l = a * (x - s_tm) + (1 - a) * (lvl + trd)
        new_b = b * (new_l - lvl) + (1 - b) * trd
        new_s = g * (x - new_l) + (1 - g) * s_tm
        lvl, trd = new_l, new_b
        seas = [new_s] + seas[:-1]
        got.append((lvl, trd, new_s))
    # truncated filter
    wl, wb, ws = _hw_weights()
    for t in range(len(xs)):
        fl = sum(wl[j] * xs[t - j] for j in range(min(t + 1, HW_K)))
        fb = sum(wb[j] * xs[t - j] for j in range(min(t + 1, HW_K)))
        fs = sum(ws[j] * xs[t - j] for j in range(min(t + 1, HW_K)))
        assert abs(fl - got[t][0]) < 1e-9, f"level diverges at t={t}"
        assert abs(fb - got[t][1]) < 1e-9, f"trend diverges at t={t}"
        assert abs(fs - got[t][2]) < 1e-9, f"seasonal diverges at t={t}"
    # and the Spark key runs with the right shape on the fixture
    from flink_streaming_gnn_spark.operators.techind import ts_holt_winters

    rows = ts_holt_winters(spark, SF_SMOKE).limit(5).collect()
    assert {c for c in rows[0].asDict()} == {
        "day", "qty", "level", "trend", "seasonal"
    }


# ---------------------------------------------------------------------------
# operators/robust.py — trimmed/winsorized means vs a numpy twin.


def test_trimmed_winsorized_vs_numpy(spark):
    from collections import defaultdict

    import numpy as np

    from flink_streaming_gnn_spark.operators.robust import (
        TRIM_P,
        agg_trimmed_winsorized_mean,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).collect()
    rev = defaultdict(float)
    for r in rows:
        rev[r.l_orderkey] += r.l_extendedprice * (1 - r.l_discount)
    y = np.array(list(rev.values()))
    lo = round(float(np.percentile(y, 100 * TRIM_P)), 4)
    hi = round(float(np.percentile(y, 100 * (1 - TRIM_P))), 4)
    kept = y[(y >= lo) & (y <= hi)]
    wins = np.clip(y, lo, hi)
    r = agg_trimmed_winsorized_mean(spark, SF_SMOKE).collect()[0]
    assert r.n_orders == len(y)
    assert abs(r.cut_lo - lo) < 1e-6 and abs(r.cut_hi - hi) < 1e-6
    assert abs(r.mean - round(float(y.mean()), 4)) < 1e-3
    assert abs(r.trimmed_mean - round(float(kept.mean()), 4)) < 1e-3
    assert abs(r.winsorized_mean - round(float(wins.mean()), 4)) < 1e-3
    # robustness ordering on a right-skewed distribution: both robust
    # estimators sit at or below the raw mean's tail pull direction
    assert min(r.trimmed_mean, r.winsorized_mean) <= r.mean + 1e-9


# ---------------------------------------------------------------------------
# llm/textstats.py — source vocabulary overlap vs a Python set twin.


def test_source_vocab_overlap_vs_python(spark):
    from collections import defaultdict

    from flink_streaming_gnn_spark.llm.textstats import text_source_vocab_overlap
    from flink_streaming_gnn_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    vocab = defaultdict(set)
    for d in docs:
        vocab[d.source].update(t for t in d.text.split(" ") if t)
    pairs = []
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            common = len(vocab[a] & vocab[b])
            if common:
                j = common / len(vocab[a] | vocab[b])
                pairs.append((round(j, 6), a, b, common))
    pairs.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(a, b, c, round(j, 6)) for j, a, b, c in pairs[:20]]
    got = [
        (r.src_a, r.src_b, r.common, r.vocab_jaccard)
        for r in text_source_vocab_overlap(spark, SF_SMOKE).collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# llm/nb.py — confusion metrics vs a Python twin over the scored preds.


def test_ml_eval_confusion_vs_python(spark):
    from collections import Counter

    from flink_streaming_gnn_spark.llm.nb import ml_eval_confusion, ml_nb_score
    from flink_streaming_gnn_spark.sources.tables import load_table

    preds = {r.doc_id: r.pred_lang for r in ml_nb_score(spark, SF_SMOKE).collect()}
    truth = {
        r.doc_id: r.lang
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang").collect()
        if r.doc_id in preds
    }
    n_true: Counter = Counter(truth.values())
    n_pred: Counter = Counter(preds.values())
    n_corr: Counter = Counter(
        truth[d] for d in preds if preds[d] == truth[d]
    )
    got = {r.lang: r for r in ml_eval_confusion(spark, SF_SMOKE).collect()}
    assert set(got) == set(n_true) | set(n_pred)
    for lang, r in got.items():
        assert (r.n_true, r.n_pred, r.n_correct) == (
            n_true[lang], n_pred[lang], n_corr[lang]
        )
        p = n_corr[lang] / n_pred[lang] if n_pred[lang] else 0.0
        rc = n_corr[lang] / n_true[lang] if n_true[lang] else 0.0
        f1 = 2 * p * rc / (p + rc) if p + rc else 0.0
        assert abs(r.precision - round(p, 6)) < 1e-6
        assert abs(r.recall - round(rc, 6)) < 1e-6
        assert abs(r.f1 - round(f1, 6)) < 1e-6
    # micro-accuracy consistency: sum of correct == correct predictions
    assert sum(r.n_correct for r in got.values()) == sum(
        1 for d in preds if preds[d] == truth[d]
    )


# ---------------------------------------------------------------------------
# operators/profile.py — referential integrity: the healthy fixture has
# zero orphans everywhere, and counts equal direct set arithmetic.


def test_referential_integrity_vs_python(spark):
    from flink_streaming_gnn_spark.operators.profile import (
        _FK_CHECKS,
        dq_referential_integrity,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    got = {r.fk: r for r in dq_referential_integrity(spark, SF_SMOKE).collect()}
    assert len(got) == len(_FK_CHECKS)
    for name, child_t, child_k, parent_t, parent_k in _FK_CHECKS:
        child = [r[0] for r in load_table(spark, SF_SMOKE, child_t).select(child_k).collect()]
        parents = {r[0] for r in load_table(spark, SF_SMOKE, parent_t).select(parent_k).collect()}
        orphans = sum(1 for k in child if k not in parents)
        r = got[name]
        assert r.n_child_rows == len(child)
        assert r.n_orphans == orphans
        assert r.pass_ == (orphans == 0) if hasattr(r, "pass_") else True
        assert r["pass"] == (orphans == 0)


# ---------------------------------------------------------------------------
# operators/nonparam.py — Mann–Whitney U vs a from-scratch midrank twin.


def test_mann_whitney_vs_python(spark):
    import math as m
    from collections import defaultdict

    from flink_streaming_gnn_spark.operators.nonparam import (
        TYPE_A,
        TYPE_B,
        dq_mann_whitney,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "events").select("event_type", "value").collect()
    per_v: dict = defaultdict(lambda: [0, 0])
    for r in rows:
        if r.event_type == TYPE_A:
            per_v[r.value][0] += 1
        elif r.event_type == TYPE_B:
            per_v[r.value][1] += 1
    cum, r_a, tie = 0, 0.0, 0
    n_a = sum(c[0] for c in per_v.values())
    n_b = sum(c[1] for c in per_v.values())
    for v in sorted(per_v):
        ca, cb = per_v[v]
        t = ca + cb
        r_a += ca * (cum + (t + 1) / 2)
        tie += t * (t * t - 1)
        cum += t
    u_a = r_a - n_a * (n_a + 1) / 2
    n = n_a + n_b
    sigma = m.sqrt(n_a * n_b / 12 * ((n + 1) - tie / (n * (n - 1))))
    z = (u_a - n_a * n_b / 2) / sigma
    got = dq_mann_whitney(spark, SF_SMOKE).collect()[0]
    assert (got.n_a, got.n_b) == (n_a, n_b)
    assert abs(got.u_stat - u_a) < 1e-6
    assert abs(got.z_score - round(z, 6)) < 1e-6
    # sanity: U within its range
    assert 0 <= got.u_stat <= n_a * n_b


# ---------------------------------------------------------------------------
# graph/motifs.py — dyad census vs a Python set twin and the identity
# mutual + asymmetric + null == C(n, 2).


def test_dyad_census_vs_python(spark):
    from flink_streaming_gnn_spark.graph.edges import derive_vertex_embeddings
    from flink_streaming_gnn_spark.graph.motifs import graph_dyad_census

    edges = {
        (r.src_v, r.dst_v)
        for r in derive_vertex_embeddings(spark, SF_SMOKE).collect()
        if r.src_v != r.dst_v
    }
    verts = {v for e in edges for v in e}
    und = {tuple(sorted(e)) for e in edges}
    mutual = sum(1 for a, b in und if (a, b) in edges and (b, a) in edges)
    r = graph_dyad_census(spark, SF_SMOKE).collect()[0]
    assert r.n_vertices == len(verts)
    assert r.mutual == mutual
    assert r.asymmetric == len(und) - mutual
    n = len(verts)
    assert r.mutual + r.asymmetric + r.null_dyads == n * (n - 1) // 2


# ---------------------------------------------------------------------------
# operators/nonparam.py — chi-square independence vs a Python twin.


def test_chi2_independence_vs_python(spark):
    import math as m
    from collections import Counter

    from flink_streaming_gnn_spark.operators.nonparam import dq_chi2_independence
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "events").select("event_type", "ts").collect()
    obs = Counter((r.event_type, r.ts.isoweekday()) for r in rows)
    row_t = Counter()
    col_t = Counter()
    for (et, wd), c in obs.items():
        row_t[et] += c
        col_t[wd] += c
    n = sum(obs.values())
    chi2 = sum(
        round((c - row_t[et] * col_t[wd] / n) ** 2 / (row_t[et] * col_t[wd] / n), 6)
        for (et, wd), c in obs.items()
    )
    dof = (len(row_t) - 1) * (len(col_t) - 1)
    v = m.sqrt(chi2 / n / min(len(row_t) - 1, len(col_t) - 1))
    r = dq_chi2_independence(spark, SF_SMOKE).collect()[0]
    assert r.n_events == n
    assert abs(r.chi2 - round(chi2, 6)) < 1e-6
    assert r.dof == dof
    assert abs(r.cramers_v - round(v, 6)) < 1e-6
    assert 0.0 <= r.cramers_v <= 1.0


# ---------------------------------------------------------------------------
# operators/movers.py — top movers and new/returning vs Python twins.


def test_top_movers_vs_python(spark):
    from collections import defaultdict

    from flink_streaming_gnn_spark.operators.movers import (
        TOP_MOVERS,
        olap_top_movers,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    orders = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    }
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, SF_SMOKE, "customer").collect()
    }
    nation = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, SF_SMOKE, "nation").collect()
    }
    monthly = defaultdict(float)
    for r in load_table(spark, SF_SMOKE, "lineitem").collect():
        nm = nation[cust[orders[r.l_orderkey]]]
        month = r.l_shipdate.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        monthly[(nm, month)] += r.l_extendedprice * (1 - r.l_discount)
    deltas = []
    by_nation = defaultdict(list)
    for (nm, month), rev in monthly.items():
        by_nation[nm].append((month, round(rev, 2)))
    for nm, series in by_nation.items():
        series.sort()
        for (m0, r0), (m1, r1) in zip(series, series[1:]):
            deltas.append((round(r1 - r0, 2), nm, m1, r1))
    deltas.sort(key=lambda t: (-abs(t[0]), t[1], t[2]))
    want = [(nm, mo, rev, d) for d, nm, mo, rev in deltas[:TOP_MOVERS]]
    got = [
        (r.n_name, r.month, r.revenue, r.mom_delta)
        for r in olap_top_movers(spark, SF_SMOKE).collect()
    ]
    assert [(w[0], w[1]) for w in want] == [(g[0], g[1]) for g in got]
    for w, g in zip(want, got):
        assert abs(w[2] - g[2]) < 0.02 and abs(w[3] - g[3]) < 0.02


def test_new_vs_returning_vs_python(spark):
    from collections import defaultdict

    from flink_streaming_gnn_spark.operators.movers import olap_new_vs_returning
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "events").select("user_id", "ts").collect()
    active = {(r.user_id, r.ts.date()) for r in rows}
    first = {}
    for u, d in sorted(active, key=lambda t: t[1]):
        first.setdefault(u, d)
    per_day = defaultdict(lambda: [0, 0])
    for u, d in active:
        per_day[d][0 if first[u] == d else 1] += 1
    got = {r.day.date(): r for r in olap_new_vs_returning(spark, SF_SMOKE).collect()}
    assert set(got) == set(per_day)
    for d, (new, ret) in per_day.items():
        assert (got[d].new_users, got[d].returning_users) == (new, ret)
        assert got[d].active_users == new + ret
    # conservation: every user is new exactly once
    assert sum(v[0] for v in per_day.values()) == len(first)


# ---------------------------------------------------------------------------
# llm/nb.py — calibration bins vs a Python softmax/binning twin.


def test_calibration_bins_vs_python(spark):
    import math as m
    from collections import defaultdict

    from flink_streaming_gnn_spark.llm.nb import (
        N_CAL_BINS,
        _per_class_scores,
        ml_calibration_bins,
    )

    rows = _per_class_scores(spark, SF_SMOKE).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    bins = defaultdict(lambda: [0, 0.0, 0])
    for scores in by_doc.values():
        scores.sort(key=lambda r: (-r.score, r.lang))
        top = scores[0]
        smax = max(r.score for r in scores)
        conf = 1.0 / sum(m.exp(r.score - smax) for r in scores)
        b = min(int(conf * N_CAL_BINS), N_CAL_BINS - 1)
        bins[b][0] += 1
        bins[b][1] += conf
        bins[b][2] += 1 if top.lang == top.true_lang else 0
    got = {r.bin: r for r in ml_calibration_bins(spark, SF_SMOKE).collect()}
    assert set(got) == set(bins)
    n_total = sum(v[0] for v in bins.values())
    ece = sum(
        v[0] * abs(round(v[2] / v[0], 6) - round(v[1] / v[0], 6))
        for v in bins.values()
    ) / n_total
    for b, (n, csum, corr) in bins.items():
        r = got[b]
        assert r.n_docs == n
        assert abs(r.avg_confidence - round(csum / n, 6)) < 1e-6
        assert abs(r.accuracy - round(corr / n, 6)) < 1e-6
        assert abs(r.ece - round(ece, 6)) < 1e-5
        # softmax of 5 classes bounds confidence to [1/5, 1]
        assert 1.0 / 5 - 1e-9 <= r.avg_confidence <= 1.0


# ---------------------------------------------------------------------------
# final 5d trio: HHI, n-gram novelty, runs test vs Python twins.


def test_hhi_vs_python(spark):
    from collections import defaultdict

    from flink_streaming_gnn_spark.operators.inequality import (
        agg_hhi_concentration,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    rev = defaultdict(float)
    for r in load_table(spark, SF_SMOKE, "lineitem").collect():
        rev[r.l_suppkey] += r.l_extendedprice * (1 - r.l_discount)
    t = sum(rev.values())
    hhi = sum((x / t) ** 2 for x in rev.values())
    r = agg_hhi_concentration(spark, SF_SMOKE).collect()[0]
    assert r.n_suppliers == len(rev)
    assert abs(r.hhi - hhi) < 1e-6
    assert abs(r.effective_n - 1 / hhi) < 1e-3
    assert 1.0 / len(rev) - 1e-9 <= r.hhi <= 1.0  # mathematical bounds


def test_ngram_novelty_vs_python(spark):
    from flink_streaming_gnn_spark.llm.textstats import (
        NOVELTY_SPLIT_MOD,
        NOVELTY_TRAIN_PARTS,
        text_ngram_novelty,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()

    def gram_set(rows, n):
        out = set()
        for r in rows:
            t = r.text.split(" ")
            for i in range(len(t) - n + 1):
                out.add(" ".join(t[i : i + n]))
        return out

    train = [r for r in docs if r.doc_id % NOVELTY_SPLIT_MOD < NOVELTY_TRAIN_PARTS]
    test = [r for r in docs if r.doc_id % NOVELTY_SPLIT_MOD >= NOVELTY_TRAIN_PARTS]
    got = {r.n: r for r in text_ngram_novelty(spark, SF_SMOKE).collect()}
    for n in (1, 2, 3):
        te, tr = gram_set(test, n), gram_set(train, n)
        unseen = len(te - tr)
        assert got[n].test_ngrams == len(te)
        assert got[n].unseen == unseen
        assert abs(got[n].novelty - round(unseen / len(te), 6)) < 1e-9
    # novelty grows with n (longer grams are rarer to have been seen)
    assert got[1].novelty <= got[2].novelty <= got[3].novelty


def test_runs_test_vs_python(spark):
    import math as m

    from flink_streaming_gnn_spark.operators.nonparam import ts_runs_test

    daily = _daily_qty(spark)
    signs = []
    for (_, q0), (_, q1) in zip(daily, daily[1:]):
        if q1 != q0:
            signs.append(1 if q1 > q0 else -1)
    n_up = sum(1 for s in signs if s > 0)
    n_down = len(signs) - n_up
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n = n_up + n_down
    mu = 2 * n_up * n_down / n + 1
    sigma = m.sqrt((mu - 1) * (mu - 2) / (n - 1))
    r = ts_runs_test(spark, SF_SMOKE).collect()[0]
    assert (r.n_up, r.n_down, r.n_runs) == (n_up, n_down, runs)
    assert abs(r.z_score - round((runs - mu) / sigma, 6)) < 1e-6


def test_lorenz_deciles_vs_python(spark):
    from collections import defaultdict

    import numpy as np

    from flink_streaming_gnn_spark.operators.inequality import agg_lorenz_deciles
    from flink_streaming_gnn_spark.sources.tables import load_table

    rev = defaultdict(float)
    for r in load_table(spark, SF_SMOKE, "lineitem").collect():
        rev[r.l_suppkey] += r.l_extendedprice * (1 - r.l_discount)
    xs = np.array(list(rev.values()))
    cuts = [round(float(np.percentile(xs, 10 * i)), 4) for i in range(1, 10)]
    per_d = defaultdict(lambda: [0, 0.0])
    for x in xs:
        d = 1 + sum(1 for c in cuts if x > c)
        per_d[d][0] += 1
        per_d[d][1] += x
    total = sum(v[1] for v in per_d.values())
    got = {r.decile: r for r in agg_lorenz_deciles(spark, SF_SMOKE).collect()}
    assert set(got) == set(per_d)
    cum = 0.0
    for d in sorted(per_d):
        n, s = per_d[d]
        cum += s
        assert got[d].n_suppliers == n
        assert abs(got[d].rev_share - round(s / total, 6)) < 1e-5
        assert abs(got[d].cum_share - round(cum / total, 6)) < 1e-5
    # Lorenz properties: cumulative shares increase to 1, top decile
    # holds at least its population share
    assert abs(got[max(got)].cum_share - 1.0) < 1e-6
    assert got[max(got)].rev_share >= 0.1 - 1e-9


# ---------------------------------------------------------------------------
# operators/nonparam.py — Poisson bootstrap vs a Python twin, plus the
# statistical sanity that the CI brackets the point estimate.


def test_bootstrap_ci_vs_python(spark):
    import hashlib
    from collections import defaultdict

    import numpy as np

    from flink_streaming_gnn_spark.operators.nonparam import (
        B_RESAMPLES,
        _W_TABLE,
        agg_bootstrap_ci_poisson,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    rev = defaultdict(float)
    for r in load_table(spark, SF_SMOKE, "lineitem").collect():
        rev[r.l_orderkey] += r.l_extendedprice * (1 - r.l_discount)
    means = []
    for b in range(B_RESAMPLES):
        s = wsum = 0.0
        for k, y in rev.items():
            nib = int(hashlib.md5(f"{k}_{b}".encode()).hexdigest()[0], 16)
            w = _W_TABLE[nib]
            s += w * y
            wsum += w
        means.append(s / wsum)
    lo = float(np.percentile(means, 2.5))
    hi = float(np.percentile(means, 97.5))
    r = agg_bootstrap_ci_poisson(spark, SF_SMOKE).collect()[0]
    assert r.n_orders == len(rev)
    assert abs(r.ci_lo - round(lo, 4)) < 1e-3
    assert abs(r.ci_hi - round(hi, 4)) < 1e-3
    assert r.ci_lo < r.mean_rev < r.ci_hi  # CI brackets the estimate
    # weight table is mean-1 (unbiased resample size)
    assert sum(_W_TABLE) == len(_W_TABLE)


def test_symmetric_difference_vs_python(spark):
    from flink_streaming_gnn_spark.operators.setops import (
        set_symmetric_difference,
    )
    from flink_streaming_gnn_spark.sources.tables import load_table

    rows = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_shipdate"
    ).collect()
    a = {r.l_partkey for r in rows if r.l_shipdate.year == 1995}
    b = {r.l_partkey for r in rows if r.l_shipdate.year == 2000}
    want = {(p, "only_1995") for p in a - b} | {(p, "only_2000") for p in b - a}
    got = {
        (r.partkey, r.side)
        for r in set_symmetric_difference(spark, SF_SMOKE).collect()
    }
    assert got == want
    # sanity: no part appears on both sides
    sides = {}
    for p, s in got:
        assert sides.setdefault(p, s) == s
