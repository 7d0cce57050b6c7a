"""Round-14 continuation pins: pure-Python THIRD replications of the
new stats5 shelf (Brown-Forsythe, Yule-Walker AR(2), Page-Hinkley,
Haar energies). The Spark-vs-DuckDB oracle compare certifies the two
ENGINES agree; these tests certify the shared algebra IS the intended
statistic, by recomputing each from the raw parquet with independent
pure-Python integer arithmetic (the dHash/matrix-profile discipline).
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

import duckdb

from blow_spark.queries import stats5

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    for t in ("events",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con.execute(sql).fetchall()


def _hourly(scale: int, how: str) -> dict[str, list[int]]:
    """Independent dense hourly series build (plain Python floors)."""
    import math

    raw = _rows("SELECT event_type, epoch_us(ts), value FROM events")
    acc: dict[tuple[str, int], list[int]] = defaultdict(lambda: [0, 0])
    types = set()
    for et, us, v in raw:
        types.add(et)
        h = us // 3_600_000_000 - stats5._T0_H
        if 0 <= h < stats5._CAL_HOURS:
            cell = acc[(et, h)]
            # FLOOR(value*scale): one IEEE multiply + floor, as in SQL
            cell[0] += math.floor(v * scale)
            cell[1] += 1
    out: dict[str, list[int]] = {}
    for et in sorted(types):
        xs = []
        for h in range(stats5._CAL_HOURS):
            s, c = acc.get((et, h), (0, 0))
            if c == 0:
                xs.append(0)
            else:
                xs.append(s // c if how == "mean" else s)
        out[et] = xs
    return out


def test_yule_walker_matches_python(spark):
    got = {
        r["event_type"]: r
        for r in stats5.timeseries_yule_walker_ar2(spark, SF)
        .collect()
    }
    series = _hourly(1, "mean")
    n = stats5._CAL_HOURS
    for et, xs in series.items():
        S = sum(xs)
        dd = [n * x - S for x in xs]
        c0 = sum(d * d for d in dd)
        c1 = sum(dd[i] * dd[i + 1] for i in range(n - 1))
        c2 = sum(dd[i] * dd[i + 2] for i in range(n - 2))
        row = got[et]
        assert (row["c0"], row["c1"], row["c2"]) == (c0, c1, c2)
        den = c0 * c0 - c1 * c1
        if den > 0:
            # staged truncating e6 readout, replicated exactly
            def staged(num: int) -> int:
                sgn = 1 if num >= 0 else -1
                m = abs(num)
                return sgn * (
                    (m // den) * 1_000_000
                    + ((m % den) * 1000 // den) * 1000
                    + (((m % den) * 1000 % den) * 1000) // den
                )

            assert row["phi1_e6"] == staged(c1 * (c0 - c2))
            assert row["phi2_e6"] == staged(c2 * c0 - c1 * c1)
            # and the staged value is within 1 ulp-of-e6 of the true ratio
            assert (
                abs(
                    Fraction(row["phi1_e6"], 10**6)
                    - Fraction(c1 * (c0 - c2), den)
                )
                <= Fraction(2, 10**6)
            )


def test_page_hinkley_matches_python(spark):
    got = {
        r["event_type"]: r
        for r in stats5.timeseries_page_hinkley(spark, SF).collect()
    }
    for et, xs in _hourly(1000, "mean").items():
        cx = 0
        M = 0
        mmin = 0
        ph = []
        first_min_done = False
        for h, x in enumerate(xs):
            cx += x
            term = x - cx // (h + 1) - stats5._PH_DELTA_E3
            M += term
            mmin = M if not first_min_done else min(mmin, M)
            first_min_done = True
            ph.append(M - mmin)
        mx = max(ph)
        row = got[et]
        assert row["max_ph_e3"] == mx
        assert row["h_at_max"] == ph.index(mx)
        alarms = [h for h, p in enumerate(ph) if p >= stats5._PH_LAMBDA_E3]
        assert row["n_alarm_hours"] == len(alarms)
        assert row["first_alarm_h"] == (alarms[0] if alarms else None)


def test_haar_energy_conservation_and_python(spark):
    rows = stats5.timeseries_haar_wavelet_energy(spark, SF).collect()
    by = defaultdict(dict)
    for r in rows:
        by[r["event_type"]][(r["level"], r["kind"])] = (
            int(r["energy"]),
            r["n_coeffs"],
        )
    series = _hourly(100, "sum")
    L = stats5._HAAR_LEVELS
    for et, got in by.items():
        xs = series[et][: stats5._HAAR_N]
        # python cascade
        cur = xs
        assert got[(0, "input")] == (sum(x * x for x in cur), len(cur))
        for lvl in range(1, L + 1):
            s = [cur[2 * i] + cur[2 * i + 1] for i in range(len(cur) // 2)]
            d = [cur[2 * i] - cur[2 * i + 1] for i in range(len(cur) // 2)]
            assert got[(lvl, "detail")] == (
                sum(v * v for v in d),
                len(d),
            )
            cur = s
        assert got[(L, "approx")] == (sum(v * v for v in cur), len(cur))
        # Parseval for the unnormalized Haar cascade
        total = Fraction(0)
        for lvl in range(1, L + 1):
            total += Fraction(got[(lvl, "detail")][0], 2**lvl)
        total += Fraction(got[(L, "approx")][0], 2**L)
        assert total == got[(0, "input")][0]


def test_brown_forsythe_matches_python(spark):
    rows = stats5.stats_levene_brown_forsythe(spark, SF).collect()
    raw = _rows(
        "SELECT event_type, CAST(FLOOR(value * 1000) AS BIGINT) FROM events"
    )
    groups: dict[str, list[int]] = defaultdict(list)
    for et, v in raw:
        groups[et].append(v)
    med = {}
    moments = {}
    for et, vs in groups.items():
        vs.sort()
        n = len(vs)
        # lower median: min v with 2*cum >= n over the value-grain counts
        med[et] = vs[(n - 1) // 2]
        z = [abs(v - med[et]) for v in vs]
        moments[et] = (n, sum(z), z)
    N = sum(m[0] for m in moments.values())
    k = len(moments)
    zbar = {et: m[1] * 10**6 // m[0] for et, m in moments.items()}
    gbar = sum(m[1] for m in moments.values()) * 10**6 // N
    ssw = sum(
        (zi * 10**6 - zbar[et]) ** 2
        for et, m in moments.items()
        for zi in m[2]
    )
    ssb = sum(
        m[0] * (zbar[et] - gbar) ** 2 for et, m in moments.items()
    )
    f_e6 = (ssb * 10**6 // ssw) * (N - k) // (k - 1) if ssw else None
    for r in rows:
        et = r["event_type"]
        assert r["n_g"] == moments[et][0]
        assert r["med_e3"] == med[et]
        assert r["sum_absdev_e3"] == moments[et][1]
        assert r["zbar_e6"] == zbar[et]
        assert r["f_e6"] == f_e6
        assert r["n_total"] == N and r["k"] == k


# ---------------------------------------------------------------------------
# batch 2: subsequences / best-F1 / IVM / Soundex third replications
# ---------------------------------------------------------------------------


def _rows_t(sql: str, tables: tuple[str, ...]):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchall()


def test_frequent_subsequences_matches_python(spark):
    from blow_spark.queries.journeys import events_frequent_subsequences

    got = {
        (r["a_type"], r["b_type"]): r
        for r in events_frequent_subsequences(spark, SF).collect()
    }
    raw = _rows_t(
        "SELECT user_id, event_id, event_type, epoch_us(ts) FROM events"
        " ORDER BY user_id, epoch_us(ts), event_id",
        ("events",),
    )
    sessions: dict[tuple[int, int], dict[str, list[int]]] = {}
    last: dict[int, int] = {}
    sess_no: dict[int, int] = {}
    for uid, eid, et, us in raw:
        if uid not in last or us - last[uid] > 1_800_000_000:
            sess_no[uid] = sess_no.get(uid, 0) + 1
        last[uid] = us
        key = (uid, sess_no[uid])
        d = sessions.setdefault(key, {})
        mn_mx = d.setdefault(et, [us, us])
        mn_mx[0] = min(mn_mx[0], us)
        mn_mx[1] = max(mn_mx[1], us)
    n_sessions = len(sessions)
    n_a: dict[str, int] = defaultdict(int)
    n_ab: dict[tuple[str, str], int] = defaultdict(int)
    for d in sessions.values():
        for et in d:
            n_a[et] += 1
        for a in d:
            for b in d:
                if a != b and d[a][0] < d[b][1]:
                    n_ab[(a, b)] += 1
    assert set(got) == set(n_ab)
    for (a, b), n in n_ab.items():
        r = got[(a, b)]
        assert r["n_sessions_pair"] == n
        assert r["n_sessions_a"] == n_a[a]
        assert r["n_sessions"] == n_sessions
        assert r["support_e6"] == n * 10**6 // n_sessions
        assert r["confidence_e6"] == n * 10**6 // n_a[a]


def test_best_f1_matches_python(spark):
    from blow_spark.queries.evalrank import eval_best_f1_threshold

    got = {
        r["event_type"]: r
        for r in eval_best_f1_threshold(spark, SF).collect()
    }
    import math

    raw = _rows_t(
        "SELECT event_type, event_id, value FROM events", ("events",)
    )
    per: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for et, eid, v in raw:
        per[et].append((math.floor(v * 1000), 1 if eid % 5 == 0 else 0))
    for et, pts in per.items():
        n = len(pts)
        p = sum(x[1] for x in pts)
        # sweep distinct thresholds descending
        from itertools import groupby

        pts.sort(key=lambda x: -x[0])
        best = (-1, None, None, None)  # f1, thr, tp, fp
        cn = tp = 0
        for thr, grp in groupby(pts, key=lambda x: x[0]):
            g = list(grp)
            cn += len(g)
            tp += sum(x[1] for x in g)
            f1 = 2 * tp * 10**6 // (tp + cn + p - tp)
            # smallest threshold wins ties -> strictly greater replaces,
            # equal also replaces (descending thr order => later = smaller)
            if f1 >= best[0]:
                best = (f1, thr, tp, cn - tp)
        r = got[et]
        assert r["n"] == n and r["n_pos"] == p
        assert r["best_f1_e6"] == best[0]
        assert r["thr_e3_at_best"] == best[1]
        assert r["tp_at_best"] == best[2]
        assert r["fp_at_best"] == best[3]


def test_ivm_matched_and_python(spark):
    from blow_spark.queries.relational3 import ops_ivm_join_delta

    rows = ops_ivm_join_delta(spark, SF).collect()
    assert rows and all(r["matched"] for r in rows)
    ora = _rows_t(
        """
        SELECT n_name, COUNT(*),
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1
        """,
        ("orders", "customer", "nation"),
    )
    full = {n: (c, int(r)) for n, c, r in ora}
    for r in rows:
        assert (r["total_cnt"], r["total_rev_c"]) == full[r["n_name"]]
        assert r["base_cnt"] + r["delta_cnt"] == r["total_cnt"]
        assert r["base_rev_c"] + r["delta_rev_c"] == r["total_rev_c"]


def _py_soundex(word: str) -> str:
    codes = dict(
        zip(
            "AEIOUYHWBFPVCGJKQSXZDTLMNR",
            "00000000111122222222334556",
        )
    )
    u = word.upper()
    t = "".join(codes[ch] for ch in u)
    # collapse adjacent equal digits
    out = []
    for ch in t:
        if not out or out[-1] != ch:
            out.append(ch)
    digits = "".join(out)[1:].replace("0", "")
    return u[0] + (digits[:3] + "000")[:3]


def test_soundex_blocking_matches_python(spark):
    from blow_spark.queries.entity import er_soundex_blocking

    got = {
        r["soundex_code"]: r for r in er_soundex_blocking(spark, SF).collect()
    }
    raw = _rows_t("SELECT p_name FROM part", ("part",))
    wc: dict[str, int] = defaultdict(int)
    for (name,) in raw:
        a, b = name.split(" ", 1)
        wc[a] += 1
        wc[b] += 1
    blocks: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for w, n in wc.items():
        blocks[_py_soundex(w)].append((w, n))
    assert set(got) == set(blocks)
    for code, members in blocks.items():
        r = got[code]
        tot = sum(n for _, n in members)
        assert r["n_words"] == len(members)
        assert r["n_tokens"] == tot
        assert r["cross_word_pairs"] == (
            tot * tot - sum(n * n for _, n in members)
        ) // 2
        assert r["min_word"] == min(w for w, _ in members)
    # the fixture realizes a genuine phonetic collision (red/rod)
    assert any(r["n_words"] >= 2 for r in got.values())


# ---------------------------------------------------------------------------
# batch 3: Kalman / Theil-Sen / LTTB third replications
# ---------------------------------------------------------------------------


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // b
    return q if a >= 0 else -q


def test_kalman_matches_python(spark):
    got = {
        r["event_type"]: r
        for r in stats5.timeseries_kalman_filter_1d(spark, SF).collect()
    }
    q, rr = stats5._KAL_Q_E9, stats5._KAL_R_E9
    for et, xs in _hourly(1000, "mean").items():
        xhat, p = xs[0], 10**9
        kk = sa = ma = hmax = 0
        for h in range(1, stats5._CAL_HOURS):
            pp = p + q
            kk = (pp * 10**9) // (pp + rr)
            innov = xs[h] - xhat
            xhat += _tdiv(kk * innov, 10**9)
            p = ((10**9 - kk) * pp) // 10**9
            sa += abs(innov)
            if abs(innov) > ma:
                ma, hmax = abs(innov), h
        row = got[et]
        assert row["xhat_final_e3"] == xhat
        assert row["p_final_e9"] == p
        assert row["k_final_e9"] == kk
        assert row["sum_abs_innov_e3"] == sa
        assert (row["max_abs_innov_e3"], row["h_at_max"]) == (ma, hmax)
        # the steady-state gain solves k = (p+q)/(p+q+r) with p fixed:
        # sanity that the filter converged to a contraction (0 < k < 1)
        assert 0 < row["k_final_e9"] < 10**9


def test_theil_sen_matches_python(spark):
    got = {
        r["event_type"]: r
        for r in stats5.stats_theil_sen_slope(spark, SF).collect()
    }
    import math

    raw = _rows("SELECT event_type, epoch_us(ts), value FROM events")
    acc = defaultdict(lambda: [0, 0])
    for et, us, v in raw:
        d = us // 86_400_000_000 - stats5._T0_D
        if 0 <= d < stats5._TS_DAYS:
            acc[(et, d)][0] += math.floor(v * 1000)
            acc[(et, d)][1] += 1
    types = {et for (et, _) in acc}
    for et in types:
        xs = []
        for d in range(stats5._TS_DAYS):
            s, c = acc.get((et, d), (0, 0))
            xs.append(s // c if c else 0)
        pairs = [
            (xs[j] - xs[i], j - i)
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
        ]
        pairs.sort(key=lambda p: (p[0] / p[1], p[0], p[1]))
        num, den = pairs[stats5._TS_MED_RANK - 1]
        row = got[et]
        assert (row["slope_num_e3"], row["slope_den_days"]) == (num, den)
        assert row["slope_e6"] == _tdiv(num * 10**6, den)


def test_lttb_matches_python_and_shape(spark):
    rows = stats5.timeseries_lttb_downsample(spark, SF).collect()
    by = defaultdict(list)
    for r in rows:
        by[r["event_type"]].append((r["b"], r["h_sel"], r["x_sel"]))
    series = _hourly(1000, "mean")
    bw, nb = stats5._LTTB_BW, stats5._LTTB_NB
    for et, sel in by.items():
        xs = series[et]
        assert len(sel) == nb
        assert sel[0] == (0, 0, xs[0])
        assert sel[-1] == (nb - 1, len(xs) - 1, xs[-1])
        ha, xa = 0, xs[0]
        for b in range(1, nb - 1):
            nlo, nhi = (b + 1) * bw, (b + 2) * bw
            cnt, hsum = nhi - nlo, sum(range(nlo, nhi))
            xsum = sum(xs[nlo:nhi])
            best = None
            for h in range(b * bw, (b + 1) * bw):
                area = abs(
                    (ha * cnt - hsum) * (xs[h] - xa)
                    - (ha - h) * (xsum - xa * cnt)
                )
                if best is None or area > best[0]:
                    best = (area, h)
            ha, xa = best[1], xs[best[1]]
            assert sel[b] == (b, ha, xa)
            # every selected point lies inside its bucket
            assert b * bw <= ha < (b + 1) * bw


# ---------------------------------------------------------------------------
# batch 4: DTMF matched-filter pins
# ---------------------------------------------------------------------------


def test_dtmf_all_windows_match_and_cover_plan(spark):
    """Every (doc, window) detects its planted digit (the in-plan
    proof bit is universally TRUE), every one of the 16 row x col
    combos appears in the fixture id space, and a pure-Python
    replication (synthesis + matched filter, no numpy/no container)
    agrees with the engine on a sample of docs."""
    from blow_spark.queries.multimodal_q import (
        _DTMF_A1,
        _DTMF_A2,
        _DTMF_COLS,
        _DTMF_N,
        _DTMF_ROWS,
        multimodal_dtmf_tone_detect,
    )

    rows = multimodal_dtmf_tone_detect(spark, SF).collect()
    assert rows and all(r["tone_match"] for r in rows)
    combos = {
        (_DTMF_ROWS[r["doc_id"] % 4], _DTMF_COLS[(r["doc_id"] // 4) % 4])
        for r in rows
    }
    assert len(combos) == 16
    # pure-Python third replication on the first 8 docs
    def sq(p, m):
        return 1 if (m % p) < p // 2 else -1

    got = {(r["doc_id"], r["window_no"]): r for r in rows}
    for doc in range(8):
        pr = _DTMF_ROWS[doc % 4]
        pc = _DTMF_COLS[(doc // 4) % 4]
        for w in range(2):
            ms = range(w * _DTMF_N, (w + 1) * _DTMF_N)
            xs = [
                _DTMF_A1 * sq(pr, m)
                + _DTMF_A2 * sq(pc, m)
                + ((doc * 31 + m * 17) % 7 - 3)
                for m in ms
            ]

            def corr(p):
                return abs(sum(x * sq(p, m) for x, m in zip(xs, ms)))

            rbest = min((-corr(p), p) for p in _DTMF_ROWS)[1]
            cbest = min((-corr(p), p) for p in _DTMF_COLS)[1]
            r = got[(doc, w)]
            assert (r["row_p_detected"], r["col_p_detected"]) == (rbest, cbest)
            assert (r["corr_row"], r["corr_col"]) == (corr(rbest), corr(cbest))


# ---------------------------------------------------------------------------
# batch 5: random walks / chi2 third replications
# ---------------------------------------------------------------------------


def test_random_walks_match_python(spark):
    import hashlib

    from blow_spark.queries.graph2 import (
        _RW_PER_SEED,
        _RW_SEEDS,
        _RW_STEPS,
        graph_seeded_random_walks,
    )

    rows = graph_seeded_random_walks(spark, SF).collect()
    got = {(r["walk_id"], r["step"]): (r["side"], r["node"]) for r in rows}
    edges = _rows_t(
        "SELECT DISTINCT o.o_custkey, l.l_partkey FROM orders o"
        " JOIN lineitem l ON o.o_orderkey = l.l_orderkey",
        ("orders", "lineitem"),
    )
    fwd, rev = defaultdict(set), defaultdict(set)
    for c, p in edges:
        fwd[c].add(p)
        rev[p].add(c)
    seeds = sorted(fwd)[:_RW_SEEDS]
    n_expected = 0
    for c in seeds:
        for j in range(_RW_PER_SEED):
            wid = c * 10 + j
            node = c
            assert got[(wid, 0)] == ("c", c)
            n_expected += 1
            for t in range(1, _RW_STEPS + 1):
                nbrs = fwd[node] if t % 2 == 1 else rev[node]
                if not nbrs:
                    break
                node = min(
                    nbrs,
                    key=lambda u: hashlib.md5(
                        f"{wid}-{t}-{u}".encode()
                    ).hexdigest(),
                )
                assert got[(wid, t)] == ("p" if t % 2 == 1 else "c", node)
                n_expected += 1
    assert len(got) == n_expected


def test_chi2_feature_selection_matches_python(spark):
    import math
    import re as re_mod

    from blow_spark.queries.text3 import (
        _CHI2_TOPK,
        text_chi2_feature_selection,
    )

    rows = text_chi2_feature_selection(spark, SF).collect()
    docs = _rows_t("SELECT doc_id, lang, text FROM documents", ("documents",))
    inc = defaultdict(set)  # term -> set(doc), and per-class
    inc_cls = defaultdict(set)
    nl = defaultdict(int)
    for doc_id, lang, text in docs:
        nl[lang] += 1
        for term in set(re_mod.split(r"\s+", text.strip().lower())):
            inc[term].add(doc_id)
            inc_cls[(lang, term)].add(doc_id)
    n = len(docs)
    scored = defaultdict(list)
    for (lang, term), dset in inc_cls.items():
        a = len(dset)
        b = len(inc[term]) - a
        c = nl[lang] - a
        d = n - len(inc[term]) - nl[lang] + a
        if (c + d) == 0 or (b + d) == 0:
            chi = 0
        else:
            # identical IEEE chain as the engines
            num = float(a) * d - float(b) * c
            chi = math.floor(
                float(n) * num * num / (a + b) / (c + d) / (a + c) / (b + d)
                * 1000000
            )
        scored[lang].append((-chi, term, a, b))
    for lang, lst in scored.items():
        lst.sort()
        top = lst[:_CHI2_TOPK]
        mine = [
            (r["term"], r["n_docs_in_class"], r["n_docs_other"], r["chi2_e6"])
            for r in rows
            if r["lang"] == lang
        ]
        assert mine == [(t, a, b, -negchi) for negchi, t, a, b in top]
