"""Parity tests for the r8 additions batch: RAKE keywords,
compression-ratio signal, group-mean imputation, BH FDR, item-item
CF, and the partition-evolution data path (file-level assertions for
partition pruning live in test_warehouse_manifest.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lakehouse_poc_spark import plans

SF = "/root/testdata/sf0.001"


def _rake_pandas(docs: pd.DataFrame, stop: set[str]):
    wdeg: dict[str, int] = {}
    wfreq: dict[str, int] = {}
    phrases = []  # (phrase, words)
    for _, row in docs.iterrows():
        toks = row["text"].lower().strip().split()
        run: list[str] = []
        for t in toks + ["the"]:  # sentinel stop flushes the tail
            if t in stop:
                if run:
                    phrases.append((" ".join(run), list(run)))
                    for w in run:
                        wdeg[w] = wdeg.get(w, 0) + len(run)
                        wfreq[w] = wfreq.get(w, 0) + 1
                run = []
            else:
                run.append(t)
    term = {w: round(wdeg[w] * 1e6 / wfreq[w]) for w in wdeg}
    scored: dict[str, tuple[int, int, int]] = {}
    for ph, words in phrases:
        sm = sum(term[w] for w in words)
        n, _, _ = scored.get(ph, (0, len(words), sm))
        scored[ph] = (n + 1, len(words), sm)
    rows = [
        (ph, nw, n, sm / 1e6) for ph, (n, nw, sm) in scored.items()
    ]
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:20]


def test_rake_matches_pandas(spark):
    from lakehouse_poc_spark.functions.text import STOPWORDS

    out = plans.QUERIES["rake_keywords_docs"](spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    expect = _rake_pandas(docs, set(STOPWORDS))
    got = [
        (r["phrase"], r["n_words"], r["n_occurrences"], r["score"])
        for _, r in out.iterrows()
    ]
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[0] == e[0] and g[1] == e[1] and g[2] == e[2]
        assert g[3] == pytest.approx(e[3], rel=1e-12)


def test_compression_ratio_matches_zlib(spark):
    import zlib

    out = plans.QUERIES["compression_ratio_docs"](spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for _, row in out.iterrows():
        g = docs[docs["source"] == row["source"]]
        ratios = [
            round(len(zlib.compress(t.encode(), 6)) * 1e6 / len(t.encode()))
            for t in g["text"]
        ]
        assert row["n_docs"] == len(g)
        assert row["mean_ratio"] == pytest.approx(
            sum(ratios) / len(ratios) / 1e6, rel=1e-12
        )
        assert row["n_too_repetitive"] == sum(r < 250000 for r in ratios)
        assert row["n_incompressible"] == sum(r > 900000 for r in ratios)


def test_impute_missing_matches_pandas(spark):
    out = plans.QUERIES["impute_missing_events"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["vm"] = pd.array(
        np.round(ev["value"].to_numpy() * 1e6).astype("int64"),
        dtype="Int64",
    )
    ev.loc[ev["event_id"] % 7 == 0, "vm"] = pd.NA
    ts = ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9
    ev["hh"] = (ts // 3600) % 24
    cell = (
        ev.dropna(subset=["vm"])
        .groupby(["event_type", "hh"])["vm"]
        .apply(lambda s: np.round(float(s.sum()) / len(s)))
    )
    for _, row in out.iterrows():
        g = ev[ev["event_type"] == row["event_type"]].copy()
        assert row["n_rows"] == len(g)
        assert row["n_imputed"] == int(g["vm"].isna().sum())
        fill = cell.reindex(
            list(zip(g["event_type"], g["hh"]))
        ).to_numpy()
        v = pd.to_numeric(g["vm"], errors="coerce").to_numpy(
            dtype="float64"
        )
        v = np.where(np.isnan(v), fill, v)
        assert row["mean_filled"] == pytest.approx(
            np.nansum(v) / len(g) / 1e6, rel=1e-12
        )
    # the imputation must not move the observed mean itself
    assert (out["n_imputed"] > 0).any()


def test_bh_fdr_properties_and_numpy(spark):
    out = plans.QUERIES["bh_fdr_event_tests"](spark, SF).toPandas()
    m = len(out)
    s = out.sort_values("p").reset_index(drop=True)
    # adj_p is the BH step-up: monotone in p, >= p, <= 1
    assert (s["adj_p"].to_numpy()[1:] >= s["adj_p"].to_numpy()[:-1] - 1e-15).all()
    assert (s["adj_p"] >= s["p"] - 1e-15).all()
    assert (s["adj_p"] <= 1.0 + 1e-15).all()
    # recompute step-up from the reported p values
    ranks = np.arange(1, m + 1)
    raw = s["p"].to_numpy() * m / ranks
    expect = np.minimum(1.0, np.minimum.accumulate(raw[::-1])[::-1])
    assert np.allclose(s["adj_p"].to_numpy(), expect, rtol=1e-12)
    # p matches the A&S normal tail of the reported z
    for _, row in s.iterrows():
        x = abs(row["z"]) / np.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592
        ) * t
        assert row["p"] == pytest.approx(
            round(poly * np.exp(-x * x) * 1e9) / 1e9, abs=2e-9
        )


def test_itemcf_matches_pandas_brute(spark):
    out = plans.QUERIES["itemcf_recs_parts"](spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    po = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n = po.groupby("l_partkey").size()
    anchors = sorted(
        n.index, key=lambda p: (-n[p], p)
    )[:20]
    orders_of = po.groupby("l_partkey")["l_orderkey"].apply(set)
    assert set(out["part"]) <= set(anchors)
    for pa in out["part"].unique():
        cands = []
        for pb, obs in orders_of.items():
            if pb == pa:
                continue
            c = len(orders_of[pa] & obs)
            if c:
                cands.append(
                    (pb, c, c / np.sqrt(float(n[pa]) * float(n[pb])))
                )
        cands.sort(key=lambda r: (-r[2], r[0]))
        g = out[out["part"] == pa].sort_values("rk")
        for (pb, c, cos), (_, row) in zip(cands[:3], g.iterrows()):
            assert row["rec"] == pb and row["co_orders"] == c
            assert row["cosine"] == pytest.approx(cos, rel=1e-12)


def test_xcorr_matches_numpy(spark):
    out = plans.QUERIES["xcorr_click_purchase"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    h = (
        ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9
    ) // 3600
    cx = h[ev["event_type"] == "click"].value_counts()
    cy = h[ev["event_type"] == "purchase"].value_counts()
    assert list(out["lag"]) == list(range(-3, 4))
    for _, row in out.iterrows():
        lag = int(row["lag"])
        hours = [hh for hh in cx.index if hh + lag in cy.index]
        x = np.array([cx[hh] for hh in hours], dtype=float)
        y = np.array([cy[hh + lag] for hh in hours], dtype=float)
        assert row["n_pairs"] == len(hours)
        assert row["xcorr"] == pytest.approx(
            np.corrcoef(x, y)[0, 1], rel=1e-9
        )


def test_scd4_query_and_scd6_query_registered():
    assert "scd4_customer_history" in plans.QUERIES
    assert "scd6_customer_history" in plans.QUERIES
    assert "scd4_customer_history" in plans.ORACLES
    assert "scd6_customer_history" in plans.ORACLES


def test_nearest_supplier_matches_brute(spark):
    out = plans.QUERIES["nearest_supplier_customers"](spark, SF).toPandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    clat = (cust["c_custkey"] * 37 % 18000) / 100.0 - 90.0
    clon = (cust["c_custkey"] * 91 % 36000) / 100.0 - 180.0
    slat = (sup["s_suppkey"] * 53 % 18000).to_numpy() / 100.0 - 90.0
    slon = (sup["s_suppkey"] * 97 % 36000).to_numpy() / 100.0 - 180.0
    sid = sup["s_suppkey"].to_numpy()
    got = dict(zip(out["id"], out["nearest_supplier"]))
    assert len(out) == len(cust)
    for cid, la, lo in zip(cust["c_custkey"], clat, clon):
        d2 = (la - slat) ** 2 + (lo - slon) ** 2
        best = min(zip(d2, sid))  # lexicographic: min d2, then min id
        assert got[cid] == best[1], cid


def test_reverse_search_all_terms_semantics(spark):
    out = plans.QUERIES["reverse_search_alerts_docs"](spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    tok_sets = {
        r["doc_id"]: set(r["text"].lower().strip().split())
        for _, r in docs.iterrows()
    }
    # recompute alerts: top-30 tokens by (df desc, token)
    from collections import Counter

    df = Counter()
    for s in tok_sets.values():
        df.update(s)
    ranked = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    alerts: dict[int, set[str]] = {}
    for i, (tok, _) in enumerate(ranked, start=1):
        alerts.setdefault(((i - 1) % 10) + 1, set()).add(tok)
    got = dict(zip(out["alert_id"], out["n_matching_docs"]))
    for aid, terms in alerts.items():
        n = sum(1 for s in tok_sets.values() if terms <= s)
        assert got.get(aid, 0) == n, (aid, terms)
        if aid in got:
            row = out[out["alert_id"] == aid].iloc[0]
            assert row["terms"] == " ".join(sorted(terms))


def test_exact_group_quantiles_matches_numpy(spark):
    out = plans.QUERIES["exact_group_quantiles_events"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    vm = np.round(ev["value"].to_numpy() * 1e6).astype("int64")
    for _, row in out.iterrows():
        g = np.sort(vm[(ev["event_type"] == row["event_type"]).to_numpy()])
        k = max(1, int(np.ceil(row["q"] * len(g))))
        assert row["value"] == pytest.approx(g[k - 1] / 1e6, rel=1e-12)


def test_session_paths_cover_sessions(spark):
    out = plans.QUERIES["session_paths_events"](spark, SF).toPandas()
    assert len(out) <= 10
    assert (out["n_sessions"].to_numpy()[1:] <= out["n_sessions"].to_numpy()[:-1]).all()
    assert (out["n_events"] >= out["n_sessions"]).all()
    # every path has at most 3 steps
    assert (out["path"].str.count(">") <= 2).all()


def test_did_matches_pandas(spark):
    out = plans.QUERIES["did_estimator_events"](spark, SF).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    s = (ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9).to_numpy()
    vm = np.round(ev["value"].to_numpy() * 1e6)
    mid = (s.min() + s.max()) // 2
    treat = (ev["user_id"] % 2 == 0).to_numpy()
    post = s >= mid

    def m(mask):
        return vm[mask].mean()

    def v(mask):
        g = vm[mask]
        return g.var(ddof=1) / len(g)

    did = (m(treat & post) - m(treat & ~post)) - (
        m(~treat & post) - m(~treat & ~post)
    )
    se = np.sqrt(
        v(treat & post) + v(treat & ~post) + v(~treat & post)
        + v(~treat & ~post)
    )
    assert out["did"] == pytest.approx(did / 1e6, rel=1e-9)
    assert out["se"] == pytest.approx(se / 1e6, rel=1e-9)
    assert out["t_stat"] == pytest.approx(did / se, rel=1e-9)


def test_cuped_reduces_variance_and_matches_pandas(spark):
    out = (
        plans.QUERIES["cuped_adjustment_events"](spark, SF).toPandas().iloc[0]
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    s = (ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9).to_numpy()
    vm = np.round(ev["value"].to_numpy() * 1e6)
    mid = (s.min() + s.max()) // 2
    df = pd.DataFrame(
        {"u": ev["user_id"], "vm": vm, "pre": s < mid}
    )
    g = df.groupby(["u", "pre"])["vm"].agg(["sum", "count"]).unstack("pre")
    g = g.dropna()
    def half_away(v):  # Spark/DuckDB ROUND, not numpy's half-to-even
        return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))

    x = half_away(
        g[("sum", True)].to_numpy() / g[("count", True)].to_numpy()
    )
    y = half_away(
        g[("sum", False)].to_numpy() / g[("count", False)].to_numpy()
    )
    n = len(x)
    cxy = (x * y).sum() - x.sum() * y.sum() / n
    vx = (x * x).sum() - x.sum() ** 2 / n
    vy = (y * y).sum() - y.sum() ** 2 / n
    assert out["n"] == n
    assert out["theta"] == pytest.approx(cxy / vx, rel=1e-9)
    assert out["var_reduction"] == pytest.approx(
        cxy * cxy / vx / vy, rel=1e-9
    )
    # the whole point: adjusted variance is strictly smaller
    assert out["var_adj"] < out["var_y"]


def test_business_days_closed_form_matches_numpy(spark):
    out = plans.QUERIES["business_days_latency_orders"](spark, SF).toPandas()
    o = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    j = li.merge(
        o[["o_orderkey", "o_orderpriority", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    j = j[j["l_shipdate"] >= j["o_orderdate"]]
    bdays = np.busday_count(
        j["o_orderdate"].to_numpy().astype("datetime64[D]"),
        j["l_shipdate"].to_numpy().astype("datetime64[D]"),
    )
    for _, row in out.iterrows():
        mask = (j["o_orderpriority"] == row["priority"]).to_numpy()
        assert row["n_lines"] == mask.sum()
        assert row["total_bdays"] == bdays[mask].sum()
        assert row["max_bdays"] == bdays[mask].max()


def test_top_movers_matches_pandas(spark):
    out = plans.QUERIES["top_movers_users"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    s = (ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9).to_numpy()
    mid = (s.min() + s.max()) // 2
    g = pd.DataFrame({"u": ev["user_id"], "second": s >= mid})
    n1 = g[~g["second"]].groupby("u").size()
    n2 = g[g["second"]].groupby("u").size()
    users = sorted(set(g["u"]))
    rows = sorted(
        (
            (-abs(int(n2.get(u, 0)) - int(n1.get(u, 0))), u)
            for u in users
        )
    )[:20]
    expect = [u for _, u in rows]
    assert list(out["user_id"]) == expect
    for _, r in out.iterrows():
        assert r["delta"] == int(n2.get(r["user_id"], 0)) - int(
            n1.get(r["user_id"], 0)
        )


def test_bounce_rate_consistency(spark):
    out = plans.QUERIES["bounce_rate_events"](spark, SF).toPandas()
    assert (out["n_bounces"] <= out["n_sessions"]).all()
    assert (
        out["bounce_rate"] == out["n_bounces"] / out["n_sessions"]
    ).all()
    # session total matches the sessionize query's session count
    sess = plans.QUERIES["sessionize_events"](spark, SF).toPandas()
    assert out["n_sessions"].sum() == sess["n_sessions"].sum()


def test_centroid_cosine_matches_numpy(spark):
    out = plans.QUERIES["centroid_cosine_labels"](spark, SF).toPandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    def half_away(v):  # Spark/DuckDB ROUND semantics
        return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))

    cents = {}
    for lab, g in emb.groupby("label"):
        m = np.stack(g["embedding"].to_numpy()).astype("float64")
        vm = half_away(m * 1e6)
        cents[lab] = half_away(vm.sum(axis=0) / len(vm))
    for _, r in out.iterrows():
        a, b = cents[r["label_a"]], cents[r["label_b"]]
        cos = float(a @ b) / (np.sqrt(float(a @ a)) * np.sqrt(float(b @ b)))
        assert r["cosine"] == pytest.approx(cos, rel=1e-9)
    # sanity: labeled fixture classes are separated, not collapsed
    assert out["cosine"].max() < 0.999


def test_heaps_fit_matches_numpy(spark):
    out = plans.QUERIES["heaps_law_docs"](spark, SF).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    seen: set[str] = set()
    vocab_at = []
    for _, row in docs.sort_values("doc_id").iterrows():
        seen |= set(row["text"].lower().strip().split())
        vocab_at.append(len(seen))
    d = len(vocab_at)
    assert out["n_docs"] == d and out["vocab"] == vocab_at[-1]
    pts = sorted({int(np.ceil(d * k / 10.0)) for k in range(1, 11)})
    x = np.round(np.log([n for n in pts]) * 1e9)
    y = np.round(np.log([vocab_at[n - 1] for n in pts]) * 1e9)
    n = len(x)
    beta = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    assert out["beta"] == pytest.approx(beta, rel=1e-9, abs=1e-12)
    # the synthetic corpus draws from a ~31-token vocabulary, so V(N)
    # saturates immediately and the true slope is ~0 — the degenerate
    # end of the Heaps regime (natural corpora sit at 0.4-0.6)
    assert -1e-9 <= out["beta"] <= 1.05


def test_growth_accounting_identity(spark):
    out = plans.QUERIES["growth_accounting_weekly"](spark, SF).toPandas()
    # the ledger identity per week
    assert (
        out["active"]
        == out["new_users"] + out["retained"] + out["resurrected"]
    ).all()
    # churned(w) = active(w-1) - retained(w)
    prev = out["active"].shift(1).fillna(0).astype(int)
    assert (out["churned"] == prev - out["retained"]).all()
    # total new over all weeks == total distinct users
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert out["new_users"].sum() == ev["user_id"].nunique()


def test_burstiness_matches_numpy(spark):
    out = plans.QUERIES["burstiness_events"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["s"] = (
        ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9
    )
    for _, r in out.iterrows():
        g = ev[ev["event_type"] == r["event_type"]].sort_values(
            ["user_id", "s", "event_id"]
        )
        gaps = []
        for _, u in g.groupby("user_id"):
            s = u["s"].to_numpy()
            gaps.extend((s[1:] - s[:-1]).tolist())
        gaps = np.array(gaps, dtype=float)
        assert r["n"] == len(gaps)
        mu, sd = gaps.mean(), gaps.std(ddof=0)
        assert r["burstiness"] == pytest.approx(
            (sd - mu) / (sd + mu), rel=1e-9
        )
        assert -1.0 < r["burstiness"] < 1.0


def test_chao1_and_lincoln_petersen_estimator_shapes(spark):
    c = plans.QUERIES["chao1_vocab_docs"](spark, SF).toPandas().iloc[0]
    assert c["chao1"] >= c["vocab"]  # estimate never below observed
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = [t for s in docs["text"] for t in s.lower().strip().split()]
    vc = pd.Series(toks).value_counts()
    assert c["vocab"] == len(vc) and c["n_tokens"] == len(toks)
    assert c["singletons"] == int((vc == 1).sum())
    lp = plans.QUERIES["lincoln_petersen_users"](spark, SF).toPandas().iloc[0]
    assert lp["m"] <= min(lp["n1"], lp["n2"])
    assert lp["lp_estimate"] == lp["n1"] * lp["n2"] / lp["m"]
    # estimator should land near the known truth on this fixture
    assert abs(lp["chapman_estimate"] - lp["true_n"]) / lp["true_n"] < 0.5


def test_randomized_response_debias_tracks_truth(spark):
    r = (
        plans.QUERIES["randomized_response_events"](spark, SF)
        .toPandas()
        .iloc[0]
    )
    assert 0.0 <= r["observed_rate"] <= 1.0
    # the debiased estimate is within ~3 SE of the true rate
    assert abs(r["debiased_rate"] - r["true_rate"]) <= 3 * r["std_error"] + 1e-9


def test_rbo_bounds_and_selfsimilarity_logic(spark):
    r = plans.QUERIES["rbo_df_vs_tf_terms"](spark, SF).toPandas().iloc[0]
    assert 0.0 <= r["rbo"] <= 1.0 + 1e-9
    assert 0 <= r["overlap_at_depth"] <= r["depth"]
    # overlap at full depth bounds the score: rbo <= 1, and if the two
    # rankings were identical every prefix overlap would be d (rbo→1)
    if r["overlap_at_depth"] == r["depth"]:
        assert r["rbo"] > 0.5


def test_ruzicka_bounds_and_symmetric_identity(spark):
    out = plans.QUERIES["ruzicka_similarity_sources"](spark, SF).toPandas()
    assert ((out["ruzicka"] > 0) & (out["ruzicka"] <= 1)).all()
    assert (out["sum_min"] <= out["sum_max"]).all()


def test_token_diversity_matches_scipy_free_entropy(spark):
    out = plans.QUERIES["token_diversity_sources"](spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for _, r in out.head(3).iterrows():
        toks = [
            t
            for s in docs.loc[docs["source"] == r["source"], "text"]
            for t in s.lower().strip().split()
        ]
        vc = pd.Series(toks).value_counts().to_numpy(dtype=float)
        p = vc / vc.sum()
        # nano-rounded per-term entropy, like both engines
        h = np.sum(np.round(-p * np.log(p) * 1e9)) / 1e9
        assert r["shannon_h"] == pytest.approx(h, abs=2e-6)
        assert 0.0 < r["evenness"] <= 1.0 + 1e-9


def test_mann_kendall_matches_brute(spark):
    out = plans.QUERIES["mann_kendall_daily_events"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = (
        ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9
    ) // 86400
    for _, r in out.iterrows():
        series = (
            day[ev["event_type"] == r["event_type"]]
            .value_counts()
            .sort_index()
            .to_numpy()
        )
        s = sum(
            np.sign(series[j] - series[i])
            for i in range(len(series))
            for j in range(i + 1, len(series))
        )
        assert r["s_stat"] == s and r["n_days"] == len(series)
        assert abs(r["z"]) < 10  # sanity: finite, sane magnitude


def test_activity_streaks_matches_brute(spark):
    out = plans.QUERIES["activity_streaks_users"](spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = (
        ev["ts"].astype("datetime64[ns]").astype("int64") // 10**9
    ) // 86400
    ud = pd.DataFrame({"u": ev["user_id"], "d": day}).drop_duplicates()
    for _, r in out.iterrows():
        days = sorted(ud.loc[ud["u"] == r["user_id"], "d"])
        best = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        assert r["longest_streak_days"] == best
