"""CEP tests mirroring the reference's pattern-matching test families
(flink-cep NFA/Pattern tests; MatchRecognizeITCase shapes)."""

from datetime import datetime

from incubator_flink_spark.cep import Pattern, match_pattern
from incubator_flink_spark.cep.nfa import find_matches


def ev(t, typ, v=0.0, i=0):
    return {"ts": datetime.fromisoformat(t), "event_type": typ, "value": v, "event_id": i}


SEQ = [
    ev("2024-01-01 00:00:00", "a", 1.0, 0),
    ev("2024-01-01 00:00:10", "b", 2.0, 1),
    ev("2024-01-01 00:00:20", "x", 0.0, 2),
    ev("2024-01-01 00:00:30", "b", 3.0, 3),
    ev("2024-01-01 00:00:40", "c", 4.0, 4),
]


def test_strict_next():
    p = Pattern.begin("s").where(lambda e: e["event_type"] == "a").next("t").where(
        lambda e: e["event_type"] == "b"
    )
    m = find_matches(p, SEQ)
    assert len(m) == 1  # only the adjacent a->b (idx 0,1)
    assert m[0]["s"][0]["event_id"] == 0 and m[0]["t"][0]["event_id"] == 1


def test_followed_by_relaxed():
    p = Pattern.begin("s").where(lambda e: e["event_type"] == "a").followed_by("t").where(
        lambda e: e["event_type"] == "c"
    )
    m = find_matches(p, SEQ)
    assert len(m) == 1 and m[0]["t"][0]["event_id"] == 4


def test_times_quantifier_greedy_range():
    p = Pattern.begin("bs").where(lambda e: e["event_type"] == "b").times(1, 2)
    m = find_matches(p, SEQ)
    captured = sorted(tuple(e["event_id"] for e in match["bs"]) for match in m)
    # relaxed repeats: (1,), (1,3), (3,)
    assert captured == [(1,), (1, 3), (3,)]


def test_one_or_more_and_within():
    p = (
        Pattern.begin("bs")
        .where(lambda e: e["event_type"] == "b")
        .one_or_more()
        .within(15)  # b@10 and b@30 are 20s apart → no combined match
    )
    m = find_matches(p, SEQ)
    captured = sorted(tuple(e["event_id"] for e in match["bs"]) for match in m)
    assert captured == [(1,), (3,)]


def test_optional_stage():
    p = (
        Pattern.begin("s")
        .where(lambda e: e["event_type"] == "a")
        .followed_by("mid")
        .where(lambda e: e["event_type"] == "x")
        .optional()
        .followed_by("t")
        .where(lambda e: e["event_type"] == "c")
    )
    m = find_matches(p, SEQ)
    shapes = sorted(tuple(sorted(k for k in match if match[k])) for match in m)
    assert ("mid", "s", "t") in shapes and ("s", "t") in shapes


def test_not_followed_by():
    p = (
        Pattern.begin("s")
        .where(lambda e: e["event_type"] == "a")
        .not_followed_by("nx")
        .where(lambda e: e["event_type"] == "x")
        .followed_by("t")
        .where(lambda e: e["event_type"] == "b")
    )
    m = find_matches(p, SEQ)
    # a->b@1 ok (no x between); a->b@3 blocked by x@2
    assert len(m) == 1 and m[0]["t"][0]["event_id"] == 1


def test_skip_past_last_event():
    events = [ev(f"2024-01-01 00:00:{i:02d}", "a", float(i), i) for i in range(4)]
    p = Pattern.begin("s").where(lambda e: e["event_type"] == "a").times(2)
    assert len(find_matches(p, events)) > 2  # NO_SKIP: overlapping pairs
    p2 = (
        Pattern.begin("s").where(lambda e: e["event_type"] == "a").times(2).after_match_skip_past_last_event()
    )
    m = find_matches(p2, events)
    assert [tuple(e["event_id"] for e in match["s"]) for match in m] == [(0, 1), (2, 3)]


def test_or_predicate():
    p = Pattern.begin("s").where(lambda e: e["event_type"] == "a").or_(lambda e: e["event_type"] == "c")
    m = find_matches(p, SEQ)
    assert sorted(match["s"][0]["event_id"] for match in m) == [0, 4]


def test_distributed_match_pattern(spark):
    # funnel: signup → purchase within 7 days, per user, on real events
    from incubator_flink_spark.catalog import load

    events = load(spark, "/root/testdata/sf0.001", "events")
    p = (
        Pattern.begin("signup")
        .where(lambda e: e["event_type"] == "signup")
        .followed_by("purchase")
        .where(lambda e: e["event_type"] == "purchase")
        .within(7 * 86400)
        .after_match_skip_past_last_event()
    )

    def select(key, match):
        return {
            "user_id": int(key["user_id"]),
            "signup_id": int(match["signup"][0]["event_id"]),
            "purchase_id": int(match["purchase"][0]["event_id"]),
        }

    out = match_pattern(
        events, ["user_id"], "ts", p, select,
        "user_id BIGINT, signup_id BIGINT, purchase_id BIGINT", tiebreak="event_id",
    )
    rows = out.collect()
    assert len(rows) > 0
    # every emitted pair is ordered correctly in the source data
    src = {r.event_id: r for r in events.collect()}
    for r in rows:
        assert src[r.signup_id].event_type == "signup"
        assert src[r.purchase_id].event_type == "purchase"
        assert src[r.signup_id].ts <= src[r.purchase_id].ts


def test_match_recognize_shim(spark):
    # V-shape price pattern per user (the canonical MATCH_RECOGNIZE demo):
    # strictly decreasing run then strictly increasing run — approximated
    # here with typed stages over events
    from incubator_flink_spark.catalog import load
    from incubator_flink_spark.cep.match_recognize import match_recognize, parse_pattern

    p = parse_pattern("A B+ C?", {"A": lambda e: True})
    assert [s.name for s in p.stages] == ["A", "B", "C"]
    assert p.stages[1].max_times == -1 and p.stages[2].optional

    events = load(spark, "/root/testdata/sf0.001", "events")
    out = match_recognize(
        events,
        partition_by=["user_id"],
        order_by="ts",
        pattern="V C{2}",
        define={
            "V": lambda e: e["event_type"] == "view",
            "C": lambda e: e["event_type"] == "click",
        },
        measures=lambda key, m: {
            "user_id": int(key["user_id"]),
            "view_id": int(m["V"][0]["event_id"]),
            "first_click": int(m["C"][0]["event_id"]),
            "second_click": int(m["C"][1]["event_id"]),
        },
        output_schema="user_id BIGINT, view_id BIGINT, first_click BIGINT, second_click BIGINT",
        within=86400,
        tiebreak="event_id",
    )
    rows = out.collect()
    assert rows
    src = {r.event_id: r for r in events.collect()}
    for r in rows:
        assert src[r.view_id].event_type == "view"
        assert src[r.first_click].event_type == "click"
        assert src[r.first_click].ts <= src[r.second_click].ts


# --- round-2 additions: iterative conditions, greedy, until, skip-to ---------
# (reference: flink-cep conditions/IterativeCondition.java, Pattern.java:380
# greedy / :500 until, nfa/aftermatch/AfterMatchSkipStrategy.java)


def test_iterative_condition_aggregating():
    # accept b's while the running sum of accepted b values stays < 6
    # (the funnel-analytics "sum of amounts in this pattern so far" shape)
    p = (
        Pattern.begin("bs")
        .where(lambda e: e["event_type"] == "b")
        .where_iterative(
            lambda e, ctx: sum(x["value"] for x in ctx.get_events_for_pattern("bs")) + e["value"] < 6
        )
        .one_or_more()
    )
    m = find_matches(p, SEQ)
    captured = sorted(tuple(e["event_id"] for e in match["bs"]) for match in m)
    # b@1 (2.0) alone ok; b@1+b@3 = 5.0 < 6 ok; b@3 (3.0) alone ok
    assert captured == [(1,), (1, 3), (3,)]
    p6 = (
        Pattern.begin("bs")
        .where(lambda e: e["event_type"] == "b")
        .where_iterative(
            lambda e, ctx: sum(x["value"] for x in ctx.get_events_for_pattern("bs")) + e["value"] < 5
        )
        .one_or_more()
    )
    m = find_matches(p6, SEQ)
    captured = sorted(tuple(e["event_id"] for e in match["bs"]) for match in m)
    assert captured == [(1,), (3,)]  # 2.0+3.0 = 5.0 not < 5 → no combined


def test_iterative_condition_refers_to_earlier_stage():
    # second stage must exceed the first stage's value
    p = (
        Pattern.begin("first")
        .where(lambda e: e["event_type"] == "b")
        .followed_by("bigger")
        .where_iterative(lambda e, ctx: e["value"] > ctx.get_events_for_pattern("first")[0]["value"])
    )
    m = find_matches(p, SEQ)
    pairs = sorted(
        (match["first"][0]["event_id"], match["bigger"][0]["event_id"]) for match in m
    )
    # first=b@1(2.0): bigger takes b@3(3.0) — c@4 is NOT reachable from
    # b@1 because b@3 already matches "bigger" and SKIP_TILL_NEXT cannot
    # ignore a matching event (NFACompiler getIgnoreCondition =
    # NOT(take)); first=b@3(3.0): c@4(4.0)
    assert pairs == [(1, 3), (3, 4)]


def test_greedy_one_or_more():
    p = (
        Pattern.begin("bs")
        .where(lambda e: e["event_type"] == "b")
        .one_or_more()
        .greedy()
        .followed_by("end")
        .where(lambda e: e["event_type"] == "c")
    )
    m = find_matches(p, SEQ)
    captured = sorted(tuple(e["event_id"] for e in match["bs"]) for match in m)
    # greedy: each run consumes maximally — the run starting at b@1 takes
    # b@1,b@3 (no (1,)-only match); the run starting at b@3 takes (3,)
    assert captured == [(1, 3), (3,)]


def test_until_stops_loop():
    p = (
        Pattern.begin("bs")
        .where(lambda e: e["event_type"] in ("a", "b"))
        .one_or_more()
        .until(lambda e: e["event_type"] == "x")  # x@2 closes the loop
    )
    m = find_matches(p, SEQ)
    captured = sorted(tuple(e["event_id"] for e in match["bs"]) for match in m)
    # within a computation the loop can neither take nor ignore the until
    # event x@2 (NFACompiler.java:683,847 guard take/ignore with
    # NOT(until)), so runs through it are impossible — but the NFA start
    # state opens a FRESH computation at every event, so b@3 after the
    # until event still starts its own run.
    assert captured == [(0,), (0, 1), (1,), (3,)]


def test_skip_to_first():
    # classic AfterMatchSkipITCase shape: a+ b over a1 a2 a3 b
    seq = [
        ev("2024-01-01 00:00:00", "a", 1.0, 0),
        ev("2024-01-01 00:00:01", "a", 1.0, 1),
        ev("2024-01-01 00:00:02", "a", 1.0, 2),
        ev("2024-01-01 00:00:03", "b", 0.0, 3),
    ]

    def pat():
        return (
            Pattern.begin("as")
            .where(lambda e: e["event_type"] == "a")
            .one_or_more()
            .greedy()
            .followed_by("end")
            .where(lambda e: e["event_type"] == "b")
        )

    no_skip = find_matches(pat(), seq)
    assert sorted(tuple(e["event_id"] for e in m["as"]) for m in no_skip) == [
        (0, 1, 2),
        (1, 2),
        (2,),
    ]
    # SKIP_TO_FIRST(as): after emitting the (0,1,2) match, cursor moves to
    # first 'as' event (0) — subsequent matches start at 1,2 >= 0 so all
    # still emit (skip-to-first on the first stage is a no-op, as in the
    # reference where it guards against no-progress configs)
    stf = find_matches(pat().after_match_skip_to_first("as"), seq)
    assert len(stf) == 3
    # SKIP_TO_LAST(as): after (0,1,2) cursor -> 2, discarding the (1,2) run
    stl = find_matches(pat().after_match_skip_to_last("as"), seq)
    assert sorted(tuple(e["event_id"] for e in m["as"]) for m in stl) == [(0, 1, 2), (2,)]
    # SKIP_PAST_LAST_EVENT: cursor past b@3 — single match
    spl = find_matches(pat().after_match_skip_past_last_event(), seq)
    assert [tuple(e["event_id"] for e in m["as"]) for m in spl] == [(0, 1, 2)]


def test_match_recognize_prev_navigation_and_measures():
    # canonical V-shape over prices using PREV() in DEFINE (StreamExecMatch
    # MatchCodeGenerator prev/next) + FIRST/LAST/CLASSIFIER measures
    from incubator_flink_spark.cep.match_recognize import MatchAccess, parse_pattern

    prices = [5.0, 4.0, 3.0, 4.5, 6.0]
    events = [ev(f"2024-01-01 00:00:{i:02d}", "p", v, i) for i, v in enumerate(prices)]

    # STRT DOWN+ UP+ : DOWN rows strictly below previous row, UP above
    p = parse_pattern(
        "STRT DOWN+ UP+",
        {
            "DOWN": lambda e, ctx: ctx.prev() is not None and e["value"] < ctx.prev()["value"],
            "UP": lambda e, ctx: ctx.prev() is not None and e["value"] > ctx.prev()["value"],
        },
        strict=True,
    ).after_match_skip_past_last_event()
    matches = find_matches(p, events)
    assert len(matches) == 1
    m = MatchAccess(matches[0], ["STRT", "DOWN", "UP"])
    assert m.first("STRT", "value") == 5.0
    assert m.last("DOWN", "value") == 3.0  # bottom of the V
    assert m.last("UP", "value") == 6.0
    assert m.classifier() == "UP"
    assert m.count("DOWN") == 2 and m.sum_("DOWN", "value") == 7.0
    assert m.min_("DOWN", "value") == 3.0 and m.max_("UP", "value") == 6.0


def test_match_recognize_all_rows_running_vs_final(spark):
    # ALL ROWS PER MATCH: per-row RUNNING aggregates + CLASSIFIER vs FINAL
    from incubator_flink_spark.cep.match_recognize import match_recognize

    df = spark.createDataFrame(
        [(1, i, float(i + 1), "a" if i < 2 else "b") for i in range(4)],
        "user_id BIGINT, ts BIGINT, value DOUBLE, event_type STRING",
    )
    out = match_recognize(
        df,
        partition_by=["user_id"],
        order_by="ts",
        pattern="A+ B+",
        define={
            "A": lambda e: e["event_type"] == "a",
            "B": lambda e: e["event_type"] == "b",
        },
        measures=lambda key, running, final, row, classifier: {
            "user_id": int(key["user_id"]),
            "ts": int(row["ts"]),
            "classifier": classifier,
            "running_sum": float(sum(r["value"] for v in running.values() for r in v)),
            "final_sum": float(sum(r["value"] for v in final.values() for r in v)),
        },
        output_schema="user_id BIGINT, ts BIGINT, classifier STRING, running_sum DOUBLE, final_sum DOUBLE",
        all_rows=True,
    )
    rows = sorted(out.collect(), key=lambda r: r.ts)
    full = [r for r in rows if r.final_sum == 10.0]  # the maximal A A B B match
    assert [r.classifier for r in full] == ["A", "A", "B", "B"]
    assert [r.running_sum for r in full] == [1.0, 3.0, 6.0, 10.0]
    assert all(r.final_sum == 10.0 for r in full)


# ---- timed-out partial matches (reference: TimedOutPartialMatchHandler;
# PatternStream.select(timeoutTag, timeoutFn, selectFn)) -----------------


def _funnel(within_s=15):
    return (
        Pattern.begin("s")
        .where(lambda e: e["event_type"] == "a")
        .followed_by("t")
        .where(lambda e: e["event_type"] == "c")
        .within(within_s)
    )


def test_timed_out_partial_bounded_input():
    from incubator_flink_spark.cep.nfa import find_timed_out_matches

    # a@0 ... c@40 is outside within(15) → no match, one timeout with the
    # deepest partial (just the start stage)
    t = find_timed_out_matches(_funnel(15), SEQ)
    assert len(t) == 1
    assert [e["event_id"] for e in t[0]["s"]] == [0]
    assert "t" not in t[0]


def test_timed_out_excludes_completed_starts():
    from incubator_flink_spark.cep.nfa import find_timed_out_matches

    # within(40) lets a@0 -> c@40 complete → no timeout
    assert find_timed_out_matches(_funnel(40), SEQ) == []
    # no within → partials never time out
    p = Pattern.begin("s").where(lambda e: e["event_type"] == "a").followed_by("t").where(
        lambda e: e["event_type"] == "zzz"
    )
    assert find_timed_out_matches(p, SEQ) == []


def test_timed_out_deepest_partial_and_now_semantics():
    from incubator_flink_spark.cep.nfa import find_timed_out_matches

    # a -> b -> z: z never arrives; partial should capture BOTH completed
    # stages (deepest), not just the start
    p = (
        Pattern.begin("s")
        .where(lambda e: e["event_type"] == "a")
        .followed_by("t")
        .where(lambda e: e["event_type"] == "b")
        .followed_by("u")
        .where(lambda e: e["event_type"] == "z")
        .within(60)
    )
    t = find_timed_out_matches(p, SEQ)  # now=None: bounded input exhausted
    assert len(t) == 1
    assert [e["event_id"] for e in t[0]["s"]] == [0]
    assert [e["event_id"] for e in t[0]["t"]] == [1]
    # with now inside the window, nothing is expired yet
    assert find_timed_out_matches(p, SEQ, now=datetime.fromisoformat("2024-01-01 00:00:50")) == []
    # once now passes start+within, the timeout fires
    assert len(find_timed_out_matches(p, SEQ, now=datetime.fromisoformat("2024-01-01 00:01:01"))) == 1


def test_match_pattern_with_timeouts_distributed(spark):
    from incubator_flink_spark.catalog import load
    from incubator_flink_spark.cep import match_pattern_with_timeouts
    from incubator_flink_spark.cep.nfa import find_matches, find_timed_out_matches

    events = load(spark, "/root/testdata/sf0.001", "events")

    def make_pattern():
        return (
            Pattern.begin("signup")
            .where(lambda e: e["event_type"] == "signup")
            .followed_by("purchase")
            .where(lambda e: e["event_type"] == "purchase")
            .within(3600)
        )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "signup_id": int(m["signup"][0]["event_id"]),
            "timed_out": False,
        }

    def timeout(key, p):
        return {
            "user_id": int(key["user_id"]),
            "signup_id": int(p["signup"][0]["event_id"]),
            "timed_out": True,
        }

    out = match_pattern_with_timeouts(
        events, ["user_id"], "ts", make_pattern(), select, timeout,
        "user_id BIGINT, signup_id BIGINT, timed_out BOOLEAN", tiebreak="event_id",
    ).collect()
    got_match = {(r.user_id, r.signup_id) for r in out if not r.timed_out}
    got_to = {(r.user_id, r.signup_id) for r in out if r.timed_out}
    assert got_match and got_to and not (got_match & got_to)

    # single-process oracle over the same events
    per_user = {}
    for r in events.collect():
        per_user.setdefault(r.user_id, []).append(
            {"ts": r.ts, "event_type": r.event_type, "event_id": r.event_id}
        )
    exp_match, exp_to = set(), set()
    for uid, evs in per_user.items():
        evs.sort(key=lambda x: (x["ts"], x["event_id"]))
        for m in find_matches(make_pattern(), evs, ts_key="ts"):
            exp_match.add((uid, m["signup"][0]["event_id"]))
        for p in find_timed_out_matches(make_pattern(), evs, ts_key="ts"):
            exp_to.add((uid, p["signup"][0]["event_id"]))
    assert got_match == exp_match
    assert got_to == exp_to


# ---- SQL-text DEFINE/MEASURES (StreamExecMatch + MatchCodeGenerator) ---


def test_sql_expr_compile_define_and_measures():
    from incubator_flink_spark.cep.sql_expr import compile_define, compile_measure

    # V-shape: price strictly falling then strictly rising
    rows = [
        {"ts": 1, "price": 10.0},
        {"ts": 2, "price": 8.0},
        {"ts": 3, "price": 6.0},
        {"ts": 4, "price": 9.0},
    ]

    class Ctx:
        def __init__(self, events, idx, captured):
            self._events, self._idx, self._cap = events, idx, captured

        def prev(self, n=1):
            return self._events[self._idx - n] if self._idx - n >= 0 else None

        def ahead(self, n=1):
            return self._events[self._idx + n] if self._idx + n < len(self._events) else None

        def get_events_for_pattern(self, var):
            return self._cap.get(var, [])

    down = compile_define("DOWN", "DOWN.price < PREV(DOWN.price)")
    assert down(rows[1], Ctx(rows, 1, {}))            # 8 < 10
    assert not down(rows[3], Ctx(rows, 3, {}))        # 9 > 6
    assert not down(rows[0], Ctx(rows, 0, {}))        # PREV null -> false

    agg = compile_define("B", "SUM(B.amount) + B.amount <= 10")
    assert agg({"amount": 4}, Ctx([], 0, {"B": [{"amount": 3}]}))      # 3+4 <= 10
    assert not agg({"amount": 9}, Ctx([], 0, {"B": [{"amount": 3}]}))  # 12 > 10

    from incubator_flink_spark.cep.match_recognize import MatchAccess

    m = MatchAccess(
        {"STRT": [rows[0]], "DOWN": [rows[1], rows[2]], "UP": [rows[3]]},
        ["STRT", "DOWN", "UP"],
    )
    assert compile_measure("STRT.price")(m) == 10.0          # bare = LAST, single row
    assert compile_measure("MIN(DOWN.price)")(m) == 6.0
    assert compile_measure("LAST(UP.price)")(m) == 9.0
    assert compile_measure("COUNT(DOWN.*)")(m) == 2
    assert compile_measure("CLASSIFIER()")(m) == "UP"
    assert compile_measure("AVG(DOWN.price)")(m) == 7.0
    assert compile_measure("FIRST(DOWN.price) - LAST(DOWN.price)")(m) == 2.0
    assert compile_measure("STRT.price > 5 AND COUNT(DOWN.*) = 2")(m) is True


def test_match_recognize_sql_ticker_v_shape(spark):
    """The reference's canonical MATCH_RECOGNIZE example (ticker V-shape,
    MatchRecognizeITCase): STRT DOWN+ UP+ with PREV navigation in DEFINE
    and FIRST/LAST/COUNT measures."""
    from incubator_flink_spark.cep.match_recognize import match_recognize_sql

    rows = [
        ("ACME", 1, 12.0), ("ACME", 2, 17.0), ("ACME", 3, 13.0),
        ("ACME", 4, 11.0), ("ACME", 5, 16.0), ("ACME", 6, 18.0),
        ("BETA", 1, 20.0), ("BETA", 2, 15.0), ("BETA", 3, 25.0),
    ]
    df = spark.createDataFrame(rows, "symbol STRING, ts BIGINT, price DOUBLE")

    out = match_recognize_sql(
        df,
        partition_by=["symbol"],
        order_by="ts",
        pattern="STRT DOWN+ UP+",
        define={
            "DOWN": "DOWN.price < PREV(DOWN.price)",
            "UP": "UP.price > PREV(UP.price)",
        },
        measures={
            "start_price": "STRT.price",
            "bottom_price": "MIN(DOWN.price)",
            "end_price": "LAST(UP.price)",
            "down_days": "COUNT(DOWN.*)",
        },
        output_schema="symbol STRING, start_price DOUBLE, bottom_price DOUBLE, end_price DOUBLE, down_days BIGINT",
        strict=True,
    )
    got = {r.symbol: r for r in out.collect()}
    # ACME: 17 -> 13 -> 11 (down) -> 16 -> 18 (up); greedy UP+ takes both
    assert got["ACME"].start_price == 17.0
    assert got["ACME"].bottom_price == 11.0
    assert got["ACME"].end_price == 18.0
    assert got["ACME"].down_days == 2
    # BETA: 20 -> 15 -> 25
    assert got["BETA"].start_price == 20.0
    assert got["BETA"].bottom_price == 15.0
    assert got["BETA"].end_price == 25.0
    assert got["BETA"].down_days == 1


def test_sql_match_recognize_full_statement(spark):
    """Full `SELECT ... FROM t MATCH_RECOGNIZE (...)` statement through
    the TableEnvironment SQL surface (pre-parse rewrite; the outer SELECT
    still runs on Spark SQL)."""
    from incubator_flink_spark.api.table import TableEnvironment

    rows = [
        ("ACME", 1, 12.0), ("ACME", 2, 17.0), ("ACME", 3, 13.0),
        ("ACME", 4, 11.0), ("ACME", 5, 16.0), ("ACME", 6, 18.0),
        ("BETA", 1, 20.0), ("BETA", 2, 15.0), ("BETA", 3, 25.0),
    ]
    env = TableEnvironment(spark)
    spark.createDataFrame(rows, "symbol STRING, ts BIGINT, price DOUBLE").createOrReplaceTempView("ticker")

    out = env.sql_query("""
        SELECT symbol, bottom_price, end_price
        FROM ticker MATCH_RECOGNIZE (
          PARTITION BY symbol
          ORDER BY ts
          MEASURES
            MIN(DOWN.price) AS bottom_price,
            LAST(UP.price) AS end_price,
            COUNT(DOWN.*) AS down_days
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (STRT DOWN+ UP+)
          DEFINE
            DOWN AS DOWN.price < PREV(DOWN.price),
            UP AS UP.price > PREV(UP.price)
        ) AS T
        WHERE bottom_price < 20
        ORDER BY symbol
    """).to_df()
    got = {r.symbol: (r.bottom_price, r.end_price) for r in out.collect()}
    assert got == {"ACME": (11.0, 18.0), "BETA": (15.0, 25.0)}


def test_sql_match_recognize_all_rows_per_match(spark):
    """ALL ROWS PER MATCH through the SQL surface: one output row per
    matched input row, RUNNING aggregates by default, FINAL keyword for
    whole-match values, CLASSIFIER() per row."""
    from incubator_flink_spark.api.table import TableEnvironment

    rows = [
        ("ACME", 1, 17.0), ("ACME", 2, 13.0), ("ACME", 3, 11.0), ("ACME", 4, 16.0),
    ]
    env = TableEnvironment(spark)
    spark.createDataFrame(rows, "symbol STRING, ts BIGINT, price DOUBLE").createOrReplaceTempView("ticker2")

    out = env.sql_query("""
        SELECT ts, price, var, run_min, fin_min
        FROM ticker2 MATCH_RECOGNIZE (
          PARTITION BY symbol
          ORDER BY ts
          MEASURES
            CLASSIFIER() AS var,
            MIN(DOWN.price) AS run_min,
            FINAL MIN(DOWN.price) AS fin_min
          ALL ROWS PER MATCH
          PATTERN (STRT DOWN+ UP)
          DEFINE
            DOWN AS DOWN.price < PREV(DOWN.price),
            UP AS UP.price > PREV(UP.price)
        )
        ORDER BY ts
    """).to_df()
    got = [(r.ts, r.price, r.var, r.run_min, r.fin_min) for r in out.collect()]
    assert got == [
        (1, 17.0, "STRT", None, 11.0),   # no DOWN rows yet (RUNNING), FINAL sees 11
        (2, 13.0, "DOWN", 13.0, 11.0),
        (3, 11.0, "DOWN", 11.0, 11.0),
        (4, 16.0, "UP", 11.0, 11.0),
    ]


def test_sql_match_recognize_within_and_skip_to_next(spark):
    """WITHIN INTERVAL bounds the match window; AFTER MATCH SKIP TO NEXT
    ROW enumerates overlapping matches (NO_SKIP mapping)."""
    from incubator_flink_spark.api.table import TableEnvironment

    rows = [
        ("K", 1, "a"), ("K", 2, "b"),          # a@1 -> b@2 inside 10s
        ("K", 100, "a"), ("K", 200, "b"),      # 100s apart: outside WITHIN
        ("K", 300, "a"), ("K", 301, "a"), ("K", 302, "b"),  # overlapping starts
    ]
    env = TableEnvironment(spark)
    spark.createDataFrame(
        [(k, __import__("datetime").datetime.fromtimestamp(t, __import__("datetime").timezone.utc).replace(tzinfo=None), e) for k, t, e in rows],
        "k STRING, ts TIMESTAMP, ev STRING",
    ).createOrReplaceTempView("seqs")

    out = env.sql_query("""
        SELECT k, a_ts, b_ts
        FROM seqs MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES FIRST(A.ts) AS a_ts, LAST(B.ts) AS b_ts
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B)
          WITHIN INTERVAL '10' SECOND
          DEFINE A AS A.ev = 'a', B AS B.ev = 'b'
        )
    """).to_df()
    import datetime as _dt

    def epoch(ts):
        return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp())

    got = {(epoch(r.a_ts), epoch(r.b_ts)) for r in out.collect()}
    # a@1->b@2 matches; a@100->b@200 exceeds WITHIN INTERVAL '10' SECOND;
    # strict PATTERN adjacency leaves only a@301->b@302 in the overlap group
    assert got == {(1, 2), (301, 302)}


def test_sql_after_match_skip_to_first_and_errors(spark):
    """AFTER MATCH SKIP TO FIRST/LAST <var> maps onto the NFA strategies
    (not silently PAST LAST ROW); malformed AFTER MATCH / WITHIN /
    ORDER BY clauses raise instead of running different semantics."""
    import pytest

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    # a a b with PATTERN (A+ B): the greedy match captures both a's, the
    # overlapped one only the second — SKIP TO LAST A re-admits it while
    # SKIP PAST LAST ROW consumes it
    rows = [("K", 1, "a"), ("K", 2, "a"), ("K", 3, "b")]
    spark.createDataFrame(
        [(k, __import__("datetime").datetime.utcfromtimestamp(t), e) for k, t, e in rows],
        "k STRING, ts TIMESTAMP, ev STRING",
    ).createOrReplaceTempView("st")

    base = """
        SELECT k, a_ts, nb
        FROM st MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY {order}
          MEASURES FIRST(A.ts) AS a_ts, COUNT(A.*) AS nb
          AFTER MATCH {skip}
          PATTERN (A+ B)
          {within}
          DEFINE A AS A.ev = 'a', B AS B.ev = 'b'
        )
    """

    def run(order="ts", skip="SKIP PAST LAST ROW", within=""):
        return env.sql_query(base.format(order=order, skip=skip, within=within)).to_df()

    # SKIP PAST LAST ROW: one match consumes through the Bs
    assert run().count() == 1
    # SKIP TO LAST A: the cursor returns to the last A (ts=2), allowing the
    # second A's own match — two matches
    assert run(skip="SKIP TO LAST A").count() == 2
    # trailing ASC on ORDER BY is accepted
    assert run(order="ts ASC").count() == 1
    # malformed clauses raise, not silently change semantics
    with pytest.raises(ValueError, match="AFTER MATCH"):
        run(skip="SKIP HALFWAY")
    with pytest.raises(ValueError, match="WITHIN"):
        run(within="WITHIN INTERVAL '1:30' MINUTE TO SECOND")
    with pytest.raises(ValueError, match="DESC"):
        run(order="ts DESC")
    with pytest.raises(ValueError, match="multi-column"):
        run(order="ts, ev")


def test_measures_null_comparison_projects_null(spark):
    """MEASURES three-valued logic: a comparison with a NULL operand
    projects NULL (not FALSE); the same comparison in DEFINE still
    filters (UNKNOWN -> no match)."""
    from incubator_flink_spark.cep.match_recognize import MatchAccess
    from incubator_flink_spark.cep.sql_expr import compile_define, compile_measure

    m = MatchAccess({"A": [{"x": None, "y": 3}]}, ["A"])
    assert compile_measure("A.x > 5")(m) is None
    assert compile_measure("A.y > 5")(m) is False
    assert compile_define("A", "A.x > 5")({"x": None}, None) is False


def test_sql_skip_to_unknown_variable_raises(spark):
    """SKIP TO FIRST/LAST with a variable not in PATTERN must raise — an
    unknown name would silently run no-skip semantics (the NFA never
    finds captured rows for it, so the cursor never advances)."""
    import pytest

    from incubator_flink_spark.api.table import TableEnvironment

    env = TableEnvironment(spark)
    spark.createDataFrame(
        [("K", __import__("datetime").datetime(2024, 1, 1), "a")],
        "k STRING, ts TIMESTAMP, ev STRING",
    ).createOrReplaceTempView("skiperr")
    with pytest.raises(ValueError, match="not\\s+in PATTERN"):
        env.sql_query("""
            SELECT k, n FROM skiperr MATCH_RECOGNIZE (
              PARTITION BY k ORDER BY ts
              MEASURES COUNT(A.ev) AS n
              AFTER MATCH SKIP TO LAST Z
              PATTERN (A B)
              DEFINE A AS A.ev = 'a', B AS B.ev = 'b'
            )
        """)


def test_segmented_execution_matches_per_key(spark):
    """match_pattern_segmented (the hot-key mitigation) must produce the
    EXACT per-key result set for a within-bounded NO_SKIP pattern — every
    match fits in two consecutive within-sized segments and is claimed by
    the segment holding its first event."""
    from pyspark.sql import functions as F

    from incubator_flink_spark.catalog import load
    from incubator_flink_spark.cep.executor import match_pattern, match_pattern_segmented

    events = load(spark, "/root/testdata/sf0.001", "events").where(
        F.col("event_type").isin("click", "view", "purchase")
    )
    p = (
        Pattern.begin("c")
        .where(lambda e: e["event_type"] == "click")
        .followed_by("v")
        .where(lambda e: e["event_type"] == "view")
        .times(1, 2)
        .followed_by("p")
        .where(lambda e: e["event_type"] == "purchase")
        .within(43200)
    )

    def select(key, m):
        return {
            "user_id": int(key["user_id"]),
            "c": int(m["c"][0]["event_id"]),
            "v_last": int(m["v"][-1]["event_id"]),
            "p": int(m["p"][0]["event_id"]),
        }

    schema = "user_id BIGINT, c BIGINT, v_last BIGINT, p BIGINT"
    base = {
        tuple(r) for r in match_pattern(events, ["user_id"], "ts", p, select, schema, tiebreak="event_id").collect()
    }
    seg = {
        tuple(r)
        for r in match_pattern_segmented(
            events, ["user_id"], "ts", p, select, schema, tiebreak="event_id"
        ).collect()
    }
    assert seg == base and len(base) > 0


def test_segmented_execution_rejects_unsupported(spark):
    import pytest

    from incubator_flink_spark.catalog import load
    from incubator_flink_spark.cep.executor import match_pattern_segmented

    events = load(spark, "/root/testdata/sf0.001", "events")
    no_within = Pattern.begin("c").where(lambda e: True)
    with pytest.raises(ValueError):
        match_pattern_segmented(events, ["user_id"], "ts", no_within, lambda k, m: {}, "x INT")
    skip = Pattern.begin("c").where(lambda e: True).within(60).after_match_skip_past_last_event()
    with pytest.raises(ValueError):
        match_pattern_segmented(events, ["user_id"], "ts", skip, lambda k, m: {}, "x INT")
    # trailing notFollowedBy: forbidden region runs to end-of-stream,
    # which the 2-segment horizon truncates — must be rejected
    trailing_neg = (
        Pattern.begin("c")
        .where(lambda e: True)
        .not_followed_by("n")
        .where(lambda e: True)
        .within(60)
    )
    with pytest.raises(ValueError, match="negated"):
        match_pattern_segmented(
            events, ["user_id"], "ts", trailing_neg, lambda k, m: {}, "x INT"
        )


def test_consecutive_inner_strict():
    """consecutive() (Pattern.java:477): repeats strictly contiguous —
    'b+ consecutive' on b b x b yields runs (0,), (0,1), (1,), (3,):
    never (1,3) across the gap, unlike the default relaxed loop."""
    from datetime import datetime, timedelta

    epoch = datetime(2020, 1, 1)
    seq = ["b", "b", "x", "b"]
    events = [
        {"ts": epoch + timedelta(seconds=i), "event_type": c, "event_id": i}
        for i, c in enumerate(seq)
    ]
    p = Pattern.begin("bs").where(lambda e: e["event_type"] == "b").one_or_more().consecutive()
    got = sorted(tuple(e["event_id"] for e in m["bs"]) for m in find_matches(p, events))
    assert got == [(0,), (0, 1), (1,), (3,)]
    # control: default relaxed loop also bridges the gap
    p2 = Pattern.begin("bs").where(lambda e: e["event_type"] == "b").one_or_more()
    got2 = sorted(tuple(e["event_id"] for e in m["bs"]) for m in find_matches(p2, events))
    assert (1, 3) in got2 and (0, 1, 3) in got2


def test_after_match_skip_to_next():
    """SKIP_TO_NEXT (SkipToNextStrategy.java:30): at most one match per
    start event — 'a b+' (reluctant) on a b b emits {a0,b1} and {a0,b1,b2}
    under NO_SKIP, but SKIP_TO_NEXT keeps only the first-completed match
    per start, distinguishing it from every other strategy."""
    from datetime import datetime, timedelta

    epoch = datetime(2020, 1, 1)
    events = [
        {"ts": epoch + timedelta(seconds=i), "event_type": c, "event_id": i}
        for i, c in enumerate(["a", "b", "b"])
    ]

    def build():
        return (
            Pattern.begin("a")
            .where(lambda e: e["event_type"] == "a")
            .followed_by("bs")
            .where(lambda e: e["event_type"] == "b")
            .one_or_more()
        )

    def runs(p):
        return sorted(
            tuple(e["event_id"] for e in m["bs"]) for m in find_matches(p, events)
        )

    assert runs(build()) == [(1,), (1, 2)]  # NO_SKIP: both lengths
    assert runs(build().after_match_skip_to_next()) == [(1,)]  # one per start
    # and unlike SKIP_PAST_LAST_EVENT, a later start INSIDE the emitted
    # match survives: greedy 'b+' on b b b emits maximal runs; skipToNext
    # keeps one per start event while skipPastLast consumes the run
    bs = [
        {"ts": epoch + timedelta(seconds=i), "event_type": "b", "event_id": i}
        for i in range(3)
    ]

    def bruns(p):
        return sorted(tuple(e["event_id"] for e in m["bs"]) for m in find_matches(p, bs))

    loop = lambda: Pattern.begin("bs").where(lambda e: e["event_type"] == "b").one_or_more().greedy()  # noqa: E731
    assert bruns(loop()) == [(0, 1, 2), (1, 2), (2,)]
    assert bruns(loop().after_match_skip_to_next()) == [(0, 1, 2), (1, 2), (2,)]
    assert bruns(loop().after_match_skip_past_last_event()) == [(0, 1, 2)]


def _labeled(seq):
    from datetime import datetime, timedelta

    epoch = datetime(2020, 1, 1)
    return [
        {"ts": epoch + timedelta(seconds=i), "event_type": c, "event_id": i}
        for i, c in enumerate(seq)
    ]


def _group_runs(p, seq, names):
    return sorted(
        tuple((n, tuple(e["event_id"] for e in m.get(n, []))) for n in names)
        for m in find_matches(p, _labeled(seq))
    )


def test_group_pattern_quantifiers():
    """GroupPattern (GroupPattern.java:30; NFACompiler compiles the body
    as a sub-automaton): a whole Pattern used as one quantified stage.
    '(a b){2}' on 'abab' captures a=(0,2) b=(1,3); '(a b)+' additionally
    emits each single iteration; inner captures accumulate across
    iterations under the inner stage names."""

    def sub(pa="a", pb="b", ia="a", ib="b"):
        return (
            Pattern.begin(pa)
            .where(lambda e, c=ia: e["event_type"] == c)
            .followed_by(pb)
            .where(lambda e, c=ib: e["event_type"] == c)
        )

    assert _group_runs(Pattern.begin(sub()).times(2), "abab", ["a", "b"]) == [
        (("a", (0, 2)), ("b", (1, 3)))
    ]
    assert _group_runs(Pattern.begin(sub()).one_or_more(), "abab", ["a", "b"]) == [
        (("a", (0,)), ("b", (1,))),
        (("a", (0, 2)), ("b", (1, 3))),
        (("a", (2,)), ("b", (3,))),
    ]
    # entry contiguity: s followedBy (a next b) times(1,2)
    g = (
        Pattern.begin("s")
        .where(lambda e: e["event_type"] == "s")
        .followed_by(
            Pattern.begin("x").where(lambda e: e["event_type"] == "a")
            .next("y").where(lambda e: e["event_type"] == "b")
        )
        .times(1, 2)
    )
    assert _group_runs(g, "sabab", ["s", "x", "y"]) == [
        (("s", (0,)), ("x", (1,)), ("y", (2,))),
        (("s", (0,)), ("x", (1, 3)), ("y", (2, 4))),
    ]


def test_group_pattern_inner_contiguity():
    """Between-iteration contiguity: consecutive() makes iteration k+1
    start immediately after iteration k (no bridging a gap event), the
    default relaxed loop skips non-matching gaps."""

    def sub():
        return (
            Pattern.begin("p")
            .where(lambda e: e["event_type"] == "a")
            .next("q")
            .where(lambda e: e["event_type"] == "b")
        )

    cons = Pattern.begin(sub()).one_or_more().consecutive()
    assert _group_runs(cons, "abxab", ["p", "q"]) == [
        (("p", (0,)), ("q", (1,))),
        (("p", (3,)), ("q", (4,))),
    ]
    relaxed = Pattern.begin(sub()).one_or_more()
    assert _group_runs(relaxed, "abxab", ["p", "q"]) == [
        (("p", (0,)), ("q", (1,))),
        (("p", (0, 3)), ("q", (1, 4))),
        (("p", (3,)), ("q", (4,))),
    ]


def test_group_pattern_restrictions():
    """Reference-parity guards: greedy()/where()/until() on a group
    raise (Pattern.java checkIfNoGroupPattern; GroupPattern.java throws
    for conditions); nested groups, negated bodies, and group-level
    within/skip raise at construction."""
    import pytest

    def sub():
        return Pattern.begin("a").where(lambda e: True).followed_by("b").where(lambda e: True)

    with pytest.raises(ValueError, match="greedy"):
        Pattern.begin(sub()).one_or_more().greedy()
    with pytest.raises(ValueError, match="conditions"):
        Pattern.begin(sub()).where(lambda e: True)
    # until() on a group guards EVERY inner take/ignore edge
    # (NFACompiler getTakeCondition:950/getIgnoreCondition:932 extend
    # with NOT(until) while compiling a group body): the sub-automaton
    # stops at the first until-firing event, mid-iteration included
    def gsub():
        return (
            Pattern.begin("p")
            .where(lambda e: e["event_type"] == "a")
            .followed_by("q")
            .where(lambda e: e["event_type"] == "b")
        )

    pu = Pattern.begin(gsub()).one_or_more().until(lambda e: e["event_type"] == "u")
    got = _group_runs(pu, "abaubab", ["p", "q"])
    # events: a0 b1 a2 u3 b4 a5 b6 — (a0 b1) completes before u3; a2's
    # iteration cannot cross u3 to reach b4 (inner take/ignore die at
    # until); fresh stage-0 computations restart after the until, so
    # (a5 b6) matches; no 2-iteration chain exists (the inter-iteration
    # scan also dies at u3)
    assert got == [
        (("p", (0,)), ("q", (1,))),
        (("p", (5,)), ("q", (6,))),
    ]
    # nested groups are legal (the reference compiles group bodies
    # recursively — NFACompiler createGroupPatternState) — see
    # test_nested_group_pattern for behavior
    Pattern.begin(Pattern.begin(sub()).times(2))
    with pytest.raises(ValueError, match="negated"):
        Pattern.begin(Pattern.begin("a").where(lambda e: True).not_followed_by("n").where(lambda e: True).followed_by("b").where(lambda e: True))
    with pytest.raises(ValueError, match="within"):
        Pattern.begin(sub().within(10))
    # duplicate stage names across outer + group body raise at match time
    dup = Pattern.begin("a").where(lambda e: True).followed_by(sub())
    with pytest.raises(ValueError, match="duplicate"):
        find_matches(dup, _labeled("ab"))


def test_nested_group_pattern():
    """One level of GROUP NESTING — ``((a b)+ c){1,2}`` with strict inner
    pair, consecutive loops at both levels (the reference compiles group
    bodies recursively: NFACompiler createGroupPatternState calls back
    into generic state construction, so GroupPattern bodies may contain
    GroupPattern stages).  Expected matches hand-enumerated, independent
    of both engines."""
    inner = (
        Pattern.begin("a")
        .where(lambda e: e["event_type"] == "a")
        .next("b")
        .where(lambda e: e["event_type"] == "b")
    )
    body = (
        Pattern.begin(inner)
        .one_or_more()
        .consecutive()
        .next("c")
        .where(lambda e: e["event_type"] == "c")
    )
    p = Pattern.begin(body).times(1, 2).consecutive()
    # events: a0 b1 a2 b3 c4 a5 b6 c7
    got = _group_runs(p, "ababcabc", ["a", "b", "c"])
    assert got == sorted(
        [
            (("a", (0, 2)), ("b", (1, 3)), ("c", (4,))),
            (("a", (0, 2, 5)), ("b", (1, 3, 6)), ("c", (4, 7))),
            (("a", (2,)), ("b", (3,)), ("c", (4,))),
            (("a", (2, 5)), ("b", (3, 6)), ("c", (4, 7))),
            (("a", (5,)), ("b", (6,)), ("c", (7,))),
        ]
    )


def test_sql_pattern_group_quantifier(spark):
    """Row-pattern GROUPS through the SQL statement surface:
    PATTERN ((A B){2} C) — parenthesized sub-pattern with a quantifier,
    compiled to the engine's GroupPattern (a Spark-side superset: the
    reference's SQL planner rejects grouped quantifiers while its CEP
    library supports them via GroupPattern.java).  Strict SQL regex
    concatenation: the two (a b) iterations must be contiguous."""
    from incubator_flink_spark.api.table import TableEnvironment

    rows = [
        ("K", 1, "a"), ("K", 2, "b"), ("K", 3, "a"), ("K", 4, "b"), ("K", 5, "c"),
        ("K", 10, "a"), ("K", 11, "b"), ("K", 12, "x"),  # broken run: no match
        ("K", 13, "a"), ("K", 14, "b"), ("K", 15, "c"),  # only ONE pair before c
    ]
    import datetime as _dt

    env = TableEnvironment(spark)
    spark.createDataFrame(
        [(k, _dt.datetime.fromtimestamp(t, _dt.timezone.utc).replace(tzinfo=None), e) for k, t, e in rows],
        "k STRING, ts TIMESTAMP, ev STRING",
    ).createOrReplaceTempView("grp_seqs")
    out = env.sql_query("""
        SELECT k, a1, b2, c_ts
        FROM grp_seqs MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES FIRST(A.ts) AS a1, LAST(B.ts) AS b2, LAST(C.ts) AS c_ts
          PATTERN ((A B){2} C)
          DEFINE A AS A.ev = 'a', B AS B.ev = 'b', C AS C.ev = 'c'
        )
    """).to_df()

    def ep(ts):
        return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp())

    got = {(ep(r.a1), ep(r.b2), ep(r.c_ts)) for r in out.collect()}
    # only the 1..5 run has two contiguous (a b) pairs followed by c
    assert got == {(1, 4, 5)}

    # greedy group spelling rejected with a clear error
    import pytest

    with pytest.raises(ValueError, match="greedy group"):
        env.sql_query("""
            SELECT k FROM grp_seqs MATCH_RECOGNIZE (
              PARTITION BY k ORDER BY ts
              MEASURES FIRST(A.ts) AS a1
              PATTERN ((A B)+ C)
              DEFINE A AS A.ev = 'a', B AS B.ev = 'b', C AS C.ev = 'c'
            )
        """)


def test_sql_pattern_nested_group(spark):
    """NESTED row-pattern groups through the SQL statement surface:
    PATTERN (((A B)+? C){1,2}) — a group whose body contains a group,
    recursive-descent parsed to nested GroupPattern (r8; the reference
    compiles group bodies recursively via NFACompiler
    createGroupPatternState)."""
    import datetime as _dt

    from incubator_flink_spark.api.table import TableEnvironment

    rows = [("K", i + 1, e) for i, e in enumerate("ababcabc")]
    env = TableEnvironment(spark)
    spark.createDataFrame(
        [(k, _dt.datetime.fromtimestamp(t, _dt.timezone.utc).replace(tzinfo=None), e) for k, t, e in rows],
        "k STRING, ts TIMESTAMP, ev STRING",
    ).createOrReplaceTempView("nested_grp_seqs")
    out = env.sql_query("""
        SELECT k, a1, c_ts, n_a
        FROM nested_grp_seqs MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES FIRST(A.ts) AS a1, LAST(C.ts) AS c_ts, COUNT(A.*) AS n_a
          PATTERN (((A B)+? C){1,2})
          DEFINE A AS A.ev = 'a', B AS B.ev = 'b', C AS C.ev = 'c'
        )
    """).to_df()

    def ep(ts):
        return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp())

    got = {(ep(r.a1), ep(r.c_ts), r.n_a) for r in out.collect()}
    # events a1 b2 a3 b4 c5 a6 b7 c8; SQL default AFTER MATCH SKIP PAST
    # LAST ROW: the first emitted match is the 1-iteration ((a b)+ c) at
    # a1..c5 (reluctant +? and {1,2} prefer minimal counts; the sort
    # emits the (first,last)=(0,4) match before (0,7)), then the cursor
    # jumps past c5 and a6..c8 matches
    assert got == {(1, 5, 2), (6, 8, 1)}


def test_timeout_partial_opens_via_optional_first_inner_stage():
    """ADVICE r7: if a group's FIRST inner stage is optional, a timed-out
    partial that opens via the second inner stage must still surface on
    the timeout side output (openers walk past optional stages)."""
    from incubator_flink_spark.cep.nfa import find_timed_out_matches

    events = _labeled("bx")  # b@0 opens via gb (ga optional); never completes
    body = (
        Pattern.begin("ga")
        .where(lambda e: e["event_type"] == "a")
        .optional()
        .followed_by("gb")
        .where(lambda e: e["event_type"] == "b")
    )
    p = (
        Pattern.begin(body)
        .followed_by("end")
        .where(lambda e: e["event_type"] == "e")
        .within(100)
    )
    partials = find_timed_out_matches(p, events, ts_key="ts")
    assert any(
        not m.get("ga") and [e["event_id"] for e in m.get("gb", [])] == [0] for m in partials
    ), partials


def test_optional_start_passes_start_state_to_next_stage():
    """When an optional FIRST stage takes nothing, the next stage is the
    computation's effective START STATE (the reference's start state
    opens a computation at every event; the optional stage contributes a
    PROCEED edge) — so it must match at ANY position, for strict and
    relaxed contiguity alike (found by the strict brute-force oracle,
    r8)."""

    def runs(p, seq, names):
        return _group_runs(p, seq, names)

    strict = (
        Pattern.begin("a")
        .where(lambda e: e["event_type"] == "a")
        .optional()
        .next("b")
        .where(lambda e: e["event_type"] == "b")
    )
    # x0 b1: no 'a' anywhere; the skipped-optional path must still reach
    # b@1 (a strict start pinned to position 0 would miss it)
    assert runs(strict, "xb", ["a", "b"]) == [(("a", ()), ("b", (1,)))]
    # b0 b1: one match per start event
    assert runs(strict, "bb", ["a", "b"]) == [
        (("a", ()), ("b", (0,))),
        (("a", ()), ("b", (1,))),
    ]
    # a0 b1: both the captured-a path and the skipped-a fresh starts
    assert runs(strict, "ab", ["a", "b"]) == [
        (("a", ()), ("b", (1,))),
        (("a", (0,)), ("b", (1,))),
    ]

    relaxed = (
        Pattern.begin("a")
        .where(lambda e: e["event_type"] == "a")
        .optional()
        .followed_by("b")
        .where(lambda e: e["event_type"] == "b")
    )
    # under SKIP_TILL_NEXT a non-start b-scan stops at the first b; as a
    # fresh start it must emit BOTH
    assert runs(relaxed, "bb", ["a", "b"]) == [
        (("a", ()), ("b", (0,))),
        (("a", ()), ("b", (1,))),
    ]


def test_duplicate_stage_names_raise_unconditionally():
    """The reference throws MalformedPatternException on ANY duplicate
    stage name (NFACompiler checkPatternNameUniqueness) — group-free
    patterns included (ADVICE r7: the old behavior silently appended
    captures under the duplicated name)."""
    import pytest

    p = (
        Pattern.begin("a")
        .where(lambda e: e["event_type"] == "a")
        .followed_by("a")
        .where(lambda e: e["event_type"] == "b")
    )
    with pytest.raises(ValueError, match="duplicate"):
        find_matches(p, _labeled("ab"))


def test_group_pattern_hand_pinned_matrices():
    """Hand-enumerated expectations (independent of BOTH the NFA and the
    fuzz enumerator — ADVICE r7: the differential oracle shares the
    _group_matches reading, so pin the contested semantics by hand):
    allowCombinations loops, relaxed vs relaxed-any ENTRY, and
    until() × allowCombinations on groups."""

    def pair():
        return (
            Pattern.begin("ga")
            .where(lambda e: e["event_type"] == "a")
            .next("gb")
            .where(lambda e: e["event_type"] == "b")
        )

    # --- allowCombinations loop: iteration 2 may skip a MATCHING pair ---
    # events a0 b1 a2 b3 a4 b5; pairs (0,1) (2,3) (4,5)
    p_any = Pattern.begin(pair()).times(1, 2).allow_combinations()
    assert _group_runs(p_any, "ababab", ["ga", "gb"]) == sorted(
        [
            (("ga", (0,)), ("gb", (1,))),
            (("ga", (2,)), ("gb", (3,))),
            (("ga", (4,)), ("gb", (5,))),
            (("ga", (0, 2)), ("gb", (1, 3))),
            (("ga", (0, 4)), ("gb", (1, 5))),  # skipped the matching (2,3)
            (("ga", (2, 4)), ("gb", (3, 5))),
        ]
    )
    # default SKIP_TILL_NEXT loop: the a@2 (matching the iteration's
    # first taking stage) cannot sit in the inter-iteration gap
    p_next = Pattern.begin(pair()).times(1, 2)
    assert _group_runs(p_next, "ababab", ["ga", "gb"]) == sorted(
        [
            (("ga", (0,)), ("gb", (1,))),
            (("ga", (2,)), ("gb", (3,))),
            (("ga", (4,)), ("gb", (5,))),
            (("ga", (0, 2)), ("gb", (1, 3))),
            (("ga", (2, 4)), ("gb", (3, 5))),
        ]
    )

    # --- entry contiguity: followedByAny may skip a matching entry -------
    # events s0 a1 b2 a3 b4
    lead_any = (
        Pattern.begin("s")
        .where(lambda e: e["event_type"] == "s")
        .followed_by_any(pair())
    )
    assert _group_runs(lead_any, "sabab", ["s", "ga", "gb"]) == sorted(
        [
            (("s", (0,)), ("ga", (1,)), ("gb", (2,))),
            (("s", (0,)), ("ga", (3,)), ("gb", (4,))),
        ]
    )
    lead_next = (
        Pattern.begin("s")
        .where(lambda e: e["event_type"] == "s")
        .followed_by(pair())
    )
    assert _group_runs(lead_next, "sabab", ["s", "ga", "gb"]) == [
        (("s", (0,)), ("ga", (1,)), ("gb", (2,))),
    ]

    # --- until() beats allowCombinations: the RELAXED_ANY loop scan still
    # dies at the until event (take AND ignore guarded with NOT(until),
    # NFACompiler.java:932,950) --------------------------------------------
    # events a0 b1 u2 a3 b4
    p_u = (
        Pattern.begin(pair())
        .times(1, 2)
        .allow_combinations()
        .until(lambda e: e["event_type"] == "u")
    )
    assert _group_runs(p_u, "abuab", ["ga", "gb"]) == sorted(
        [
            (("ga", (0,)), ("gb", (1,))),
            (("ga", (3,)), ("gb", (4,))),  # fresh start past the until
            # NOT ((0,3),(1,4)): the inter-iteration scan cannot cross u@2
        ]
    )


def test_group_pattern_timeout_partials():
    """Timed-out partial matches open through a GROUP first stage: the
    partial is pinned to the start event accepted by the group's first
    inner stage, and the deepest reachable capture is returned (the
    CepOperator timeout side-output discipline, extended to
    GroupPattern sub-automata)."""
    from incubator_flink_spark.cep.nfa import find_timed_out_matches

    events = _labeled("abax")  # (a b) complete at 0-1; a@2 never pairs
    pair = (
        Pattern.begin("ga")
        .where(lambda e: e["event_type"] == "a")
        .next("gb")
        .where(lambda e: e["event_type"] == "b")
    )
    p = (
        Pattern.begin(pair)
        .times(2)
        .within(100)
    )
    # no complete (a b)(a b) exists; every a-start opens a partial
    partials = find_timed_out_matches(p, events, ts_key="ts")
    starts = sorted(m["ga"][0]["event_id"] for m in partials if m.get("ga"))
    assert starts == [0, 2]
    deepest = max(partials, key=lambda m: sum(len(v) for v in m.values()))
    assert [e["event_id"] for e in deepest["ga"]] == [0, 2]
    assert [e["event_id"] for e in deepest["gb"]] == [1]


def test_sql_match_rowtime_measure(spark):
    """MATCH_ROWTIME() / MATCH_PROCTIME() in MEASURES (FlinkSqlOperatorTable
    MATCH_ROWTIME — the time attribute of the match's LAST event): maps to
    the bare order-column reference, whose measure semantics are exactly
    last-matched-row (ONE ROW) / current-row (ALL ROWS)."""
    from incubator_flink_spark.api.table import TableEnvironment

    rows = [
        ("ACME", 1, 12.0), ("ACME", 2, 17.0), ("ACME", 3, 13.0),
        ("ACME", 4, 11.0), ("ACME", 5, 16.0), ("ACME", 6, 18.0),
    ]
    env = TableEnvironment(spark)
    spark.createDataFrame(
        rows, "symbol STRING, ts BIGINT, price DOUBLE"
    ).createOrReplaceTempView("ticker_mrt")

    out = env.sql_query("""
        SELECT symbol, match_end, end_price
        FROM ticker_mrt MATCH_RECOGNIZE (
          PARTITION BY symbol
          ORDER BY ts
          MEASURES
            MATCH_ROWTIME() AS match_end,
            LAST(UP.price) AS end_price
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (STRT DOWN+ UP+)
          DEFINE
            DOWN AS DOWN.price < PREV(DOWN.price),
            UP AS UP.price > PREV(UP.price)
        ) AS T
    """).to_df().collect()
    # the V-shape ends at ts=6 (last UP row)
    assert [(r.symbol, r.match_end, r.end_price) for r in out] == [("ACME", 6, 18.0)]

    # without an ORDER BY time attribute the function cannot resolve
    import pytest as _pytest

    with _pytest.raises(ValueError, match="MATCH_ROWTIME"):
        env.sql_query("""
            SELECT * FROM ticker_mrt MATCH_RECOGNIZE (
              PARTITION BY symbol
              MEASURES MATCH_ROWTIME() AS m
              PATTERN (A)
              DEFINE A AS TRUE
            ) AS T
        """)
