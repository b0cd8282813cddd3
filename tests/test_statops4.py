"""Parity tests for the fourth exact-stats wave (statops4): PACF,
Bollinger breaches, MCC, average precision, Page–Hinkley, Qini,
Croston, and event-type eccentricity — each against an independent
pandas/numpy reimplementation at sf0.001."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lakehouse_poc_spark import plans

SF = "/root/testdata/sf0.001"


def _round_away(x: float, scale: float = 1.0) -> float:
    """Round half-away-from-zero (Spark/DuckDB semantics; Python's
    round() and np.rint are half-to-even)."""
    v = x * scale
    return float(np.sign(v) * np.floor(np.abs(v) + 0.5)) / scale


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["h"] = (ev["ts"].astype("int64") // 10**6) // 3600
    ev["day"] = (ev["ts"].astype("int64") // 10**6) // 86400
    return ev


def test_pacf_durbin_levinson(spark):
    out = plans.QUERIES["pacf_hourly_events"](spark, SF).toPandas()
    ev = _events()
    c = ev.groupby("h").size().sort_index().to_numpy(dtype=np.int64)
    n, s = len(c), c.sum()
    d = n * c - s
    g0 = float(np.dot(d, d))
    r = [float(np.dot(d[lag:], d[:-lag])) / g0 for lag in (1, 2, 3)]
    r1, r2, r3 = r
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 - phi22 * r1
    pacf3 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    row = out.iloc[0]
    assert row["n_hours"] == n
    assert row["pacf1"] == pytest.approx(r1, rel=1e-12)
    assert row["pacf2"] == pytest.approx(phi22, rel=1e-12)
    assert row["pacf3"] == pytest.approx(pacf3, rel=1e-12)
    # PACF lag 1 must equal ACF lag 1 by construction
    assert row["pacf1"] == row["r1"]


def test_bollinger_breaches(spark):
    out = (
        plans.QUERIES["bollinger_breach_events"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    ev = _events()
    ev["w"] = (ev["value"] * 100).round().astype(np.int64)
    for etype, grp in ev.groupby("event_type"):
        w = grp.groupby("h")["w"].sum().sort_index().to_numpy(np.int64)
        up = dn = banded = 0
        bw_sum = 0.0
        for i in range(23, len(w)):
            win = w[i - 23 : i + 1]
            sw, sq = int(win.sum()), int((win * win).sum())
            mu = sw / 24
            sd = np.sqrt(24 * sq - sw * sw) / 24
            banded += 1
            if w[i] > mu + 2 * sd:
                up += 1
            if w[i] < mu - 2 * sd:
                dn += 1
            bw_sum += _round_away(4 * sd / 100, 1e6)
        row = out.loc[etype]
        assert row["n_banded"] == banded
        assert row["breaches_up"] == up
        assert row["breaches_down"] == dn
        assert row["mean_bandwidth"] == pytest.approx(
            bw_sum / banded, rel=1e-9
        )


def _median_disc(vals: pd.Series) -> int:
    v = np.sort(vals.to_numpy())
    return int(v[(len(v) + 1) // 2 - 1])


def test_mcc_confusion(spark):
    out = plans.QUERIES["mcc_click_purchase"](spark, SF).toPandas().iloc[0]
    ev = _events()
    pu = ev.pivot_table(
        index="user_id", columns="event_type", aggfunc="size", fill_value=0
    )
    clicks, purch = pu.get("click", 0), pu.get("purchase", 0)
    mc, mp = _median_disc(clicks), _median_disc(purch)
    pred, act = clicks > mc, purch > mp
    tp = int((pred & act).sum())
    fp = int((pred & ~act).sum())
    fn = int((~pred & act).sum())
    tn = int((~pred & ~act).sum())
    assert (out["tp"], out["fp"], out["fn"], out["tn"]) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / np.sqrt(
        float((tp + fp) * (tp + fn)) * float((tn + fp) * (tn + fn))
    )
    assert out["mcc"] == pytest.approx(mcc, rel=1e-12)


def test_average_precision(spark):
    out = plans.QUERIES["avg_precision_docs"](spark, SF).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    rel = (docs["lang"] == "en").to_numpy()
    cum = np.cumsum(rel)
    ks = np.nonzero(rel)[0] + 1
    ap = sum(_round_away(cum[k - 1] / k, 1e9) * 1e9 for k in ks) / 1e9 / rel.sum()
    assert out["n_docs"] == len(docs)
    assert out["n_rel"] == rel.sum()
    assert out["avg_precision"] == pytest.approx(ap, rel=1e-12)
    assert out["precision_at_10"] == cum[9] / 10


def test_page_hinkley(spark):
    out = (
        plans.QUERIES["page_hinkley_events"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    ev = _events()
    for etype, grp in ev.groupby("event_type"):
        c = grp.groupby("h").size().sort_index()
        p = c.cumsum().to_numpy(np.int64)
        t = np.arange(1, len(c) + 1)
        raw = 1e9 * (c.to_numpy() - p / t)
        terms = (np.sign(raw) * np.floor(np.abs(raw) + 0.5)).astype(np.int64)
        u = np.cumsum(terms)
        ph = u - np.minimum.accumulate(u)
        row = out.loc[etype]
        assert row["n_hours"] == len(c)
        assert row["u_final"] == pytest.approx(u[-1] / 1e9, rel=1e-12)
        assert row["ph_max"] == pytest.approx(ph.max() / 1e9, rel=1e-12)
        assert row["h_at_max"] == c.index.to_numpy()[int(np.argmax(ph))]


def test_qini_deciles(spark):
    out = plans.QUERIES["qini_uplift_events"](spark, SF).toPandas()
    ev = _events()
    pu = ev.pivot_table(
        index="user_id", columns="event_type", aggfunc="size", fill_value=0
    )
    df = pd.DataFrame(
        {
            "clicks": pu.get("click", 0),
            "purch": pu.get("purchase", 0),
        }
    ).reset_index()
    mp = _median_disc(df["purch"])
    df["treated"] = df["user_id"] % 2 == 1
    df["y"] = (df["purch"] > mp).astype(int)
    df = df.sort_values(
        ["clicks", "user_id"], ascending=[False, True]
    ).reset_index(drop=True)
    n = len(df)
    assert len(out) == 10  # one row per decile boundary
    for _, row in out.iterrows():
        k = int(row["k"])
        top = df.iloc[:k]
        nt = int(top["treated"].sum())
        nc = k - nt
        rt = int(top.loc[top["treated"], "y"].sum())
        rc = int(top.loc[~top["treated"], "y"].sum())
        assert (row["nt"], row["nc"], row["rt"], row["rc"]) == (
            nt,
            nc,
            rt,
            rc,
        )
        if nc:
            assert row["qini"] == pytest.approx(
                rt - rc * nt / nc, rel=1e-12
            )


def test_croston_folds(spark):
    out = (
        plans.QUERIES["croston_demand_events"](spark, SF)
        .toPandas()
        .set_index("user_id")
    )
    ev = _events()
    purch = ev[ev["event_type"] == "purchase"]
    daily = (
        purch.groupby(["user_id", "day"]).size().rename("d").reset_index()
    )

    def fold(xs):
        acc = xs[0]
        for x in xs[1:]:
            acc = 0.8 * acc + 0.2 * x
        return acc

    n_checked = 0
    for uid, grp in daily.groupby("user_id"):
        grp = grp.sort_values("day")
        if len(grp) < 2:
            assert uid not in out.index
            continue
        sizes = grp["d"].astype(float).tolist()
        days = grp["day"].to_numpy()
        ivals = (days[1:] - days[:-1]).astype(float).tolist()
        row = out.loc[uid]
        assert row["n_demand_days"] == len(grp)
        assert row["z_hat"] == pytest.approx(fold(sizes), rel=1e-12)
        assert row["q_hat"] == pytest.approx(fold(ivals), rel=1e-12)
        assert row["forecast_per_day"] == pytest.approx(
            fold(sizes) / fold(ivals), rel=1e-12
        )
        n_checked += 1
    assert n_checked == len(out)


def test_eccentricity_bfs(spark):
    out = (
        plans.QUERIES["eccentricity_event_types"](spark, SF)
        .toPandas()
        .set_index("node")
    )
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    edges = set()
    for _, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            if a != b:
                edges.add((a, b))
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    eccs = {}
    for src in adj:
        dist = {src: 0}
        frontier = [src]
        for hops in range(1, 6):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):  # noqa: B905
                    if v not in dist:
                        dist[v] = hops
                        nxt.append(v)
            frontier = nxt
        del dist[src]
        if dist:
            eccs[src] = (len(dist), max(dist.values()))
    assert set(out.index) == set(eccs)
    rmin = min(e for _, e in eccs.values())
    rmax = max(e for _, e in eccs.values())
    for node, (n_reached, ecc) in eccs.items():
        row = out.loc[node]
        assert row["n_reached"] == n_reached
        assert row["eccentricity"] == ecc
        assert row["is_center"] == (ecc == rmin)
        assert row["on_periphery"] == (ecc == rmax)


def test_anova_f(spark):
    out = plans.QUERIES["anova_f_events"](spark, SF).toPandas().iloc[0]
    ev = _events()
    ev["w"] = (ev["value"] * 100).round().astype(np.int64)
    g = ev.groupby("event_type")["w"].agg(["count", "sum"])
    n = int(g["count"].sum())
    k = len(g)
    s = float(g["sum"].sum())
    q = float((ev["w"].astype(float) ** 2).sum())
    # pinned-order fold over event_type-sorted terms
    terms = [
        float(r["sum"]) ** 2 / r["count"] for _, r in g.sort_index().iterrows()
    ]
    br = terms[0]
    for t in terms[1:]:
        br = br + t
    ssb = br - s * s / n
    ssw = q - br
    assert out["n"] == n and out["k"] == k
    assert out["ss_between"] == pytest.approx(ssb, rel=1e-12)
    assert out["f_stat"] == pytest.approx(
        (ssb / (k - 1)) / (ssw / (n - k)), rel=1e-12
    )
    assert out["eta_squared"] == pytest.approx(
        ssb / (q - s * s / n), rel=1e-12
    )


def test_granger_nested_ols(spark):
    out = (
        plans.QUERIES["granger_click_purchase_hourly"](spark, SF)
        .toPandas()
        .iloc[0]
    )
    ev = _events()
    grid = (
        ev.assign(
            is_c=(ev["event_type"] == "click").astype(int),
            is_p=(ev["event_type"] == "purchase").astype(int),
        )
        .groupby("h")[["is_c", "is_p"]]
        .sum()
        .sort_index()
    )
    x = grid["is_c"].to_numpy(float)
    y = grid["is_p"].to_numpy(float)
    z, a1, a2 = y[1:], y[:-1], x[:-1]
    n = len(z)
    A = np.column_stack([np.ones(n), a1, a2])
    beta, *_ = np.linalg.lstsq(A, z, rcond=None)
    rss_u = float(((z - A @ beta) ** 2).sum())
    Ar = np.column_stack([np.ones(n), a1])
    br, *_ = np.linalg.lstsq(Ar, z, rcond=None)
    rss_r = float(((z - Ar @ br) ** 2).sum())
    # query moments are in the centered-integer domain: scale by n²
    scale = float(n) ** 2
    assert out["n_pairs"] == n
    assert out["beta_y_lag"] == pytest.approx(beta[1], rel=1e-9)
    assert out["beta_x_lag"] == pytest.approx(beta[2], rel=1e-9)
    assert out["rss_u"] / scale == pytest.approx(rss_u, rel=1e-9)
    assert out["rss_r"] / scale == pytest.approx(rss_r, rel=1e-9)
    assert out["f_stat"] == pytest.approx(
        (rss_r - rss_u) * (n - 3) / rss_u, rel=1e-9
    )


def test_fleiss_kappa(spark):
    out = plans.QUERIES["fleiss_kappa_docs"](spark, SF).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    pos = (
        (docs["n_chars"] >= 200).astype(int)
        + (docs["text"].str.split().str.len() >= 30).astype(int)
        + (docs["lang"] == "en").astype(int)
    ).to_numpy()
    n = len(pos)
    p_bar = float((pos * pos + (3 - pos) * (3 - pos) - 3).sum()) / (n * 6)
    p1 = pos.sum() / (3 * n)
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    assert out["n_docs"] == n
    assert out["p_bar"] == pytest.approx(p_bar, rel=1e-12)
    assert out["fleiss_kappa"] == pytest.approx(
        (p_bar - p_e) / (1 - p_e), rel=1e-12
    )


def test_markov_attribution_chain(spark):
    out = (
        plans.QUERIES["markov_attribution_events"](spark, SF)
        .toPandas()
        .set_index("channel")
    )
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    # journeys to first purchase; transition counts
    trans: dict[tuple, int] = {}
    for _, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        path = []
        for t in types:
            path.append("CONV" if t == "purchase" else t)
            if t == "purchase":
                break
        states = ["START"] + path
        if path[-1] != "CONV":
            states.append("NULL")
        for a, b in zip(states, states[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    out_tot: dict[str, int] = {}
    for (a, _), c in trans.items():
        out_tot[a] = out_tot.get(a, 0) + c
    plists: dict[str, list] = {}
    for (a, b), c in sorted(trans.items()):
        plists.setdefault(a, []).append((b, c / out_tot[a]))
    channels = ["click", "error", "signup", "view"]
    transient = ["START"] + channels

    def run(removed):
        u = {s: 0.0 for s in transient}
        u["CONV"], u["NULL"] = 1.0, 0.0
        for _ in range(12):
            nxt = {}
            for i in transient:
                terms = [p * u[j] for j, p in plists.get(i, [])]
                acc = 0.0
                if terms:
                    acc = terms[0]
                    for x in terms[1:]:
                        acc += x
                nxt[i] = np.floor(1e12 * acc + 0.5) / 1e12
            if removed:
                nxt[removed] = 0.0
            u.update(nxt)
        return u["START"]

    base = run(None)
    effects = {c: base - run(c) for c in channels}
    denom = sum(effects.values())
    for c in channels:
        row = out.loc[c]
        assert row["base_cvr"] == pytest.approx(base, rel=1e-12)
        assert row["removal_effect"] == pytest.approx(effects[c], rel=1e-12)
        assert row["share"] == pytest.approx(effects[c] / denom, rel=1e-9)
    # removal can only hurt: every removal CVR <= base
    assert (out["removal_cvr"] <= out["base_cvr"] + 1e-15).all()


def test_sequential_triples_greedy(spark):
    out = plans.QUERIES["sequential_triples_users"](spark, SF).toPandas()
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    seqs = {
        uid: grp["event_type"].tolist() for uid, grp in ev.groupby("user_id")
    }
    types = sorted(ev["event_type"].unique())

    def contains(seq, a, b, c):
        state, want = 0, (a, b, c)
        for t in seq:
            if t == want[state]:
                state += 1
                if state == 3:
                    return True
        return False

    expect = {}
    for a in types:
        for b in types:
            for c in types:
                if a == b or b == c:
                    continue
                n = sum(contains(s, a, b, c) for s in seqs.values())
                if n > 0:
                    expect[(a, b, c)] = n
    got = {
        (r["a"], r["b"], r["c"]): r["n_users"] for _, r in out.iterrows()
    }
    assert got == expect
    assert (out["n_total"] == len(seqs)).all()


def test_theil_and_mld(spark):
    out = (
        plans.QUERIES["theil_index_revenue_nations"](spark, SF)
        .toPandas()
        .iloc[0]
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    df = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    )
    df["cents"] = (
        df["l_extendedprice"] * (1 - df["l_discount"]) * 100
    ).map(lambda x: _round_away(x))
    rev = df.groupby("n_name")["cents"].sum()
    k = len(rev)
    s = float(rev.sum())
    w = rev.to_numpy(float) * k / s
    l_micro = np.array([_round_away(np.log(x), 1e6) * 1e6 for x in w])
    theil = (
        sum(_round_away(wi * (lm / 1e6), 1e9) * 1e9 for wi, lm in zip(w, l_micro))
        / 1e9
        / k
    )
    mld = -l_micro.sum() / 1e6 / k
    assert out["n_nations"] == k
    assert out["theil_t"] == pytest.approx(theil, rel=1e-9)
    assert out["mld"] == pytest.approx(mld, rel=1e-9)
    # sanity: both are non-negative inequality measures
    assert out["theil_t"] >= 0 and out["mld"] >= 0


def test_greedy_cover_matches_sequential(spark):
    out = plans.QUERIES["greedy_cover_docs"](spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].str.len() > 0]
    tri = {}
    for _, r in docs.iterrows():
        w = r["text"].lower().split()
        tri[r["doc_id"]] = {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        }
    covered: set = set()
    expect = []
    for rnd in range(1, 11):
        gains = {
            d: len(s - covered) for d, s in tri.items() if s - covered
        }
        if not gains:
            break
        doc = min(gains, key=lambda d: (-gains[d], d))
        covered |= tri[doc]
        expect.append((rnd, doc, gains[doc], len(covered)))
    got = [
        (r["round"], r["doc_id"], r["new_tokens"], r["covered"])
        for _, r in out.iterrows()
    ]
    assert got == expect
    # greedy gains are non-increasing (submodularity)
    gains_seq = [g for _, _, g, _ in expect]
    assert all(a >= b for a, b in zip(gains_seq, gains_seq[1:]))


def test_articulation_points_brute(spark):
    out = (
        plans.QUERIES["articulation_points_event_types"](spark, SF)
        .toPandas()
        .set_index("node")
    )
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    edges = set()
    for _, grp in ev.groupby("user_id"):
        ts = grp["event_type"].tolist()
        for a, b in zip(ts, ts[1:]):
            if a != b:
                edges.add((a, b))
                edges.add((b, a))

    def n_components(excluded):
        es = {(a, b) for a, b in edges if a != excluded and b != excluded}
        nodes = {a for a, _ in es}
        comps = 0
        seen = set()
        for s in sorted(nodes):
            if s in seen:
                continue
            comps += 1
            stack = [s]
            while stack:
                u = stack.pop()
                if u in seen:
                    continue
                seen.add(u)
                stack.extend(v for a, v in es if a == u)
        return comps

    full = n_components(None)
    for x in ["click", "error", "purchase", "signup", "view"]:
        row = out.loc[x]
        without = n_components(x)
        assert row["n_components_full"] == full
        assert row["n_components_without"] == without
        assert row["is_articulation"] == (without > full)
