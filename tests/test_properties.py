"""Property-based tests (hypothesis): operator semantics vs brute-force
pure-Python reference implementations on randomized small inputs
(SURVEY.md §5.2 — the engine's own correctness layer beyond the DuckDB
oracle)."""

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

from ultimate_data_engineering_project_spark.operators import windows

BASE = datetime.datetime(2024, 1, 1)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # user_id
        st.integers(min_value=0, max_value=7200),   # seconds offset
    ),
    min_size=1,
    max_size=25,
)


@given(ev=events_strategy, gap=st.sampled_from([60, 600, 1800]))
@settings(**_SETTINGS)
def test_sessionize_matches_reference(spark, ev, gap):
    rows = [
        Row(user_id=u, event_id=i, ts=BASE + datetime.timedelta(seconds=s))
        for i, (u, s) in enumerate(ev)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["event_id"]: r["session_id"]
        for r in windows.sessionize(df, "user_id", "ts", gap, tiebreak="event_id").collect()
    }
    # pure-python reference
    expect = {}
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        sid, prev = 0, None
        for r in rs:
            if prev is None or (r.ts - prev).total_seconds() > gap:
                sid += 1
            expect[r.event_id] = sid
            prev = r.ts
    assert got == expect


rolling_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),       # key
        st.integers(min_value=0, max_value=7200),    # seconds offset (dups!)
        st.integers(min_value=-1000, max_value=1000),  # value
    ),
    min_size=1,
    max_size=30,
)


@given(
    rows=rolling_strategy,
    preceding=st.sampled_from([0, 1, 4]),
    chunk_seconds=st.sampled_from([60, 600, 3600]),
)
@settings(**_SETTINGS)
def test_rolling_sums_chunked_matches_reference(
    spark, rows, preceding, chunk_seconds
):
    """The chunked rolling recomposition (rolling = difference of two
    chunked prefix sums + a (key, row-number) equi-join) vs a
    pure-Python trailing-window fold — hypothesis hunts the edges the
    fixture misses: duplicate timestamps straddling tiebreaks, frames
    larger than a key's history, window size 1 (preceding=0), chunk
    widths from one-row-per-chunk to everything-in-one-chunk, and
    negative values (signed prefix differences)."""
    from ultimate_data_engineering_project_spark.operators.windows import (
        rolling_sums_chunked,
    )

    data = [
        Row(k=k, eid=i, ts=BASE + datetime.timedelta(seconds=s), v=v)
        for i, (k, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "k long, eid long, ts timestamp, v long"
    )
    got = {
        r["eid"]: (r["s"], r["win_n"])
        for r in rolling_sums_chunked(
            df, ["k"], ["ts", "eid"], {"s": F.col("v")}, "ts",
            preceding=preceding, chunk_seconds=chunk_seconds,
        ).collect()
    }
    by_key: dict[int, list] = {}
    for r in data:
        by_key.setdefault(r.k, []).append(r)
    expect = {}
    for rs in by_key.values():
        rs.sort(key=lambda r: (r.ts, r.eid))
        for i, r in enumerate(rs):
            frame = rs[max(0, i - preceding): i + 1]
            expect[r.eid] = (sum(x.v for x in frame), len(frame))
    assert got == expect


asof_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=15),  # left ts
    st.lists(st.integers(min_value=0, max_value=100), min_size=0, max_size=15),  # right ts
)


@given(data=asof_strategy, strict=st.booleans())
@settings(**_SETTINGS)
def test_asof_join_matches_reference(spark, data, strict):
    lts, rts = data
    left = spark.createDataFrame(
        [Row(k="a", lt=BASE + datetime.timedelta(minutes=m), lid=i) for i, m in enumerate(lts)]
    )
    rows_r = [
        Row(k="a", rt=BASE + datetime.timedelta(minutes=m), val=float(i))
        for i, m in enumerate(sorted(set(rts)))
    ]
    if not rows_r:
        return  # asof against empty right is covered in unit tests
    right = spark.createDataFrame(rows_r)
    out = windows.asof_join(
        left, right, on=["k"], left_ts="lt", right_ts="rt",
        right_cols=["val"], strict=strict,
    )
    got = {r["lid"]: r["val_asof"] for r in out.collect()}
    for i, m in enumerate(lts):
        lt = BASE + datetime.timedelta(minutes=m)
        cand = [r for r in rows_r if (r.rt < lt if strict else r.rt <= lt)]
        expect = max(cand, key=lambda r: r.rt).val if cand else None
        assert got[i] == expect, (i, m, strict)


@given(
    texts=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(
            lambda cs: " ".join(cs)
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_ngram_jaccard_matches_reference(spark, texts):
    from ultimate_data_engineering_project_spark.operators import dedup

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, "doc_id", jaccard_threshold=0.0).collect()
    }

    def sh(t, n=3):
        w = t.split()
        if len(w) < n:
            return {t}  # whole short text = one shingle (operator contract)
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            A, B = sh(texts[i]), sh(texts[j])
            expect = len(A & B) / len(A | B)
            if expect > 0:
                assert abs(got[(i, j)] - expect) < 1e-5, (texts[i], texts[j])
            else:
                assert (i, j) not in got


@given(
    vals=st.lists(
        st.tuples(st.integers(1, 3), st.floats(-1000, 1000)), min_size=1, max_size=20
    )
)
@settings(**_SETTINGS)
def test_running_sum_matches_reference(spark, vals):
    rows = [Row(k=k, i=i, v=v) for i, (k, v) in enumerate(vals)]
    df = spark.createDataFrame(rows)
    out = windows.running_sum(df, ["k"], ["i"], F.col("v").cast("decimal(25,10)"))
    got = {r["i"]: float(r["running_sum"]) for r in out.collect()}
    acc: dict[int, float] = {}
    for i, (k, v) in enumerate(vals):
        acc[k] = acc.get(k, 0.0) + v
        assert abs(got[i] - acc[k]) < 1e-5


@given(
    vals=st.lists(
        st.floats(-1e6, 1e6).map(lambda x: round(x, 4)), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_dsum_matches_exact_decimal_sum(spark, vals):
    """dsum (the oracle-parity decimal accumulator) equals Python's
    exact Decimal fold for any input order — the property the whole
    cross-engine hash-match rests on."""
    from decimal import Decimal

    from ultimate_data_engineering_project_spark.functions.scalar import dsum

    df = spark.createDataFrame([Row(v=float(v)) for v in vals])
    got = df.agg(dsum("v").alias("s")).first()["s"]
    expect = float(sum(Decimal(str(v)) for v in vals))
    assert abs(got - expect) < 1e-9 * max(1.0, abs(expect))


@given(
    data=st.tuples(
        st.lists(  # (user, ts-seconds, type 0=click 1=purchase)
            st.tuples(
                st.integers(1, 3),
                st.integers(0, 7200),
                st.integers(0, 1),
            ),
            min_size=1,
            max_size=20,
        ),
    )
)
@settings(**_SETTINGS)
def test_interval_join_matches_reference(spark, data):
    """The purchase<-click interval join (batch twin of the
    stream-stream join) against a brute-force pure-Python pairing."""
    (ev,) = data
    rows = [
        Row(
            user_id=u,
            event_id=i,
            ts=BASE + datetime.timedelta(seconds=s),
            event_type="purchase" if t else "click",
            value=0.0,
            props="{}",
        )
        for i, (u, s, t) in enumerate(ev)
    ]
    df = spark.createDataFrame(rows)
    from ultimate_data_engineering_project_spark.streaming.pipelines import (
        stream_purchase_after_click,
    )

    # the same join logic runs on a static frame (isStreaming=False)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in stream_purchase_after_click(df).collect()
    }
    expect = set()
    for p in rows:
        if p.event_type != "purchase":
            continue
        for c in rows:
            if (
                c.event_type == "click"
                and c.user_id == p.user_id
                and p.ts - datetime.timedelta(hours=1) <= c.ts < p.ts
            ):
                expect.add((p.event_id, c.event_id))
    assert got == expect


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),
            st.sampled_from(["s0", "s1", "s2"]),
            st.lists(st.sampled_from("abcdef"), min_size=1, max_size=9).map(" ".join),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    n_parts=st.sampled_from([1, 3, 13]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_pack_token_budget_partition_invariant(spark, docs, n_parts):
    """Partitioning must never change packing output (the determinism
    a resumable 100 TB packing run depends on), and token_offset stays
    inside the budget."""
    from ultimate_data_engineering_project_spark.operators.text import (
        pack_token_budget,
    )

    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    base = sorted(
        map(tuple, pack_token_budget(df, 4).drop("text").collect())
    )
    shuffled = sorted(
        map(
            tuple,
            pack_token_budget(df.repartition(n_parts), 4).drop("text").collect(),
        )
    )
    assert base == shuffled
    assert all(0 <= r[-2] < 4 for r in base)  # token_offset within budget


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    ),
    n_parts=st.sampled_from([1, 5, 17]),
)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_partition_invariant(spark, edges, n_parts):
    from ultimate_data_engineering_project_spark.operators.dedup import (
        connected_components,
    )

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    base = sorted(map(tuple, connected_components(df).collect()))
    shuffled = sorted(
        map(tuple, connected_components(df.repartition(n_parts)).collect())
    )
    assert base == shuffled


@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),
            st.lists(st.sampled_from("abcdef"), min_size=1, max_size=40).map(
                " ".join
            ),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    size=st.sampled_from([4, 8]),
    overlap=st.sampled_from([0, 2]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunk_windows_reconstructs_document(spark, docs, size, overlap):
    """Lossless-coverage invariant: chunk 0's tokens plus each later
    chunk's post-overlap tail re-concatenate to the original token
    stream, chunk ids are dense from 0, and every chunk except the tail
    is exactly `size` tokens."""
    from ultimate_data_engineering_project_spark.operators.text import chunk_windows

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = chunk_windows(df, size=size, overlap=overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    originals = dict(docs)
    stride = size - overlap
    for doc_id, chunks in by_doc.items():
        ids = sorted(chunks)
        assert ids == list(range(len(ids)))
        toks = []
        for cid in ids:
            ctoks = chunks[cid]["chunk_text"].split(" ")
            assert len(ctoks) == chunks[cid]["n_chunk_tokens"]
            if cid < len(ids) - 1:
                assert len(ctoks) == size
            toks.extend(ctoks if cid == 0 else ctoks[overlap:])
        assert " ".join(toks) == originals[doc_id]


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60),
    n_parts=st.sampled_from([1, 7]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_hash_split_partition_invariant(spark, keys, n_parts):
    """Split labels are a pure function of the key: partitioning and
    duplicate rows never change a key's label, and every label is one
    of the requested ones."""
    from ultimate_data_engineering_project_spark.functions.scalar import hash_split

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    df = spark.createDataFrame([(k,) for k in keys + keys], ["k"])
    out = df.repartition(n_parts).withColumn("s", hash_split("k", fr)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], set()).add(r["s"])
    assert all(len(v) == 1 for v in by_key.values())
    assert {s for v in by_key.values() for s in v} <= set(fr)


range_join_strategy = st.tuples(
    st.lists(st.integers(min_value=-50, max_value=500), min_size=1, max_size=20),
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=500),
            st.integers(min_value=0, max_value=120),
        ),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([7, 64, 200]),
)


@given(data=range_join_strategy)
@settings(**_SETTINGS)
def test_bin_range_join_matches_reference(spark, data):
    """bin_range_join == the O(n*m) pure-Python inequality join for any
    points/intervals/bin_width, including negative domains, empty
    intervals, and bin-straddling windows."""
    from ultimate_data_engineering_project_spark.operators.relational import (
        bin_range_join,
    )

    pts, ivs, width = data
    points = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], "pid int, p long"
    )
    intervals = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(ivs)],
        "iid int, s long, e long",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in bin_range_join(
            points, intervals, point_col="p", start_col="s", end_col="e",
            bin_width=width,
        ).select("pid", "iid").collect()
    )
    expect = sorted(
        (pi, ii)
        for pi, p in enumerate(pts)
        for ii, (s, ln) in enumerate(ivs)
        if s <= p < s + ln
    )
    assert got == expect


texts_rep_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "spam"]), min_size=0, max_size=12
    ).map(" ".join),
    min_size=1,
    max_size=10,
)


@given(texts=texts_rep_strategy)
@settings(**_SETTINGS)
def test_repetition_stats_matches_reference(spark, texts):
    """top-bigram / dup-trigram fractions == a pure-Python counter
    reference on random small-vocab texts (small vocab forces heavy
    k-gram collisions — the regime the fold must get right)."""
    from collections import Counter

    from ultimate_data_engineering_project_spark.operators.text import (
        repetition_stats,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.top_bigram_frac, r.dup_trigram_frac, r.is_repetitive)
        for r in repetition_stats(df).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")  # NB: "".split(" ") == [""] — matches F.split
        bis = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        tris = [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
        top = max(Counter(bis).values()) / len(bis) if bis else 0.0
        dup = (len(tris) - len(set(tris))) / len(tris) if tris else 0.0
        assert got[i][0] == round(top, 6), (i, t)
        assert got[i][1] == round(dup, 6), (i, t)
        assert got[i][2] == (round(top, 6) > 0.18 or round(dup, 6) > 0.30)


# --- Avro codec round-trip (pure Python, no Spark session needed) ------

_AVRO_PROP_SCHEMA = """
{"type": "record", "name": "Envelope", "fields": [
  {"name": "image", "type": ["null", {"type": "record", "name": "Value",
   "fields": [
      {"name": "id", "type": "long"},
      {"name": "small", "type": ["null", "int"]},
      {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                  "precision": 15, "scale": 2}},
      {"name": "ts", "type": {"type": "long",
                              "logicalType": "timestamp-micros"}},
      {"name": "d", "type": ["null", {"type": "int",
                                      "logicalType": "date"}]},
      {"name": "note", "type": ["null", "string"]},
      {"name": "flag", "type": "boolean"},
      {"name": "score", "type": "double"},
      {"name": "raw", "type": ["null", "bytes"]},
      {"name": "vec", "type": {"type": "array", "items": "float"}}
  ]}]},
  {"name": "echo", "type": ["null", "Value"]},
  {"name": "op", "type": "string"},
  {"name": "tags", "type": ["null", {"type": "array", "items":
     {"type": "record", "name": "Tag", "fields": [
        {"name": "k", "type": "string"},
        {"name": "n", "type": "long"}]}}]},
  {"name": "attrs", "type": {"type": "map", "values": "string"}},
  {"name": "status", "type": {"type": "enum", "name": "Status",
     "symbols": ["ACTIVE", "HELD", "CLOSED"]}},
  {"name": "checksum", "type": ["null", {"type": "fixed", "name": "Sum16",
     "size": 16}]},
  {"name": "fee", "type": {"type": "fixed", "name": "Fee", "size": 6,
     "logicalType": "decimal", "precision": 12, "scale": 3}},
  {"name": "payload", "type": ["null", "long", "string", "Status"]},
  {"name": "samples", "type": {"type": "array", "items": ["null", "double"]}},
  {"name": "wrapped", "type": ["double"]},
  {"name": "props", "type": {"type": "map", "values": ["null", "long",
     "string"]}}
]}
"""

_value_rows = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "small": st.none() | st.integers(min_value=-(2**31), max_value=2**31 - 1),
        # decimal(15,2): up to 13 integer digits, exact at scale 2
        "amount": st.integers(min_value=-(10**15) + 1, max_value=10**15 - 1).map(
            lambda u: __import__("decimal").Decimal(u).scaleb(-2)
        ),
        "ts": st.integers(min_value=0, max_value=4_102_444_800_000_000).map(
            lambda us: datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            + datetime.timedelta(microseconds=us)
        ),
        "d": st.none()
        | st.integers(min_value=-100_000, max_value=100_000).map(
            lambda days: datetime.date(1970, 1, 1) + datetime.timedelta(days=days)
        ),
        "note": st.none() | st.text(max_size=40),
        "flag": st.booleans(),
        "score": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "raw": st.none() | st.binary(max_size=20),
        # width=32 floats are exactly float32-representable, so the
        # <f pack/unpack round-trip is lossless
        "vec": st.lists(
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            max_size=8,
        ),
    }
)


@given(
    image=st.none() | _value_rows,
    echo=st.none() | _value_rows,
    op=st.text(min_size=1, max_size=4),
    tags=st.none()
    | st.lists(
        st.fixed_dictionaries(
            {
                "k": st.text(max_size=8),
                "n": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            }
        ),
        max_size=5,
    ),
    attrs=st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=5),
    status=st.sampled_from(["ACTIVE", "HELD", "CLOSED"]),
    checksum=st.none() | st.binary(min_size=16, max_size=16),
    fee=st.integers(min_value=-(10**12) + 1, max_value=10**12 - 1).map(
        lambda u: __import__("decimal").Decimal(u).scaleb(-3)
    ),
    payload=st.none()
    | st.integers(min_value=-(2**63), max_value=2**63 - 1).map(
        lambda v: {"member0": v}
    )
    | st.text(max_size=12).map(lambda s: {"member1": s})
    | st.sampled_from(["ACTIVE", "CLOSED"]).map(lambda s: {"member2": s}),
    samples=st.lists(
        st.none() | st.floats(allow_nan=False, allow_infinity=False, width=64),
        max_size=6,
    ),
    wrapped=st.floats(allow_nan=False, allow_infinity=False, width=64),
    props=st.dictionaries(
        st.text(max_size=6),
        st.none()
        | st.integers(min_value=-(2**63), max_value=2**63 - 1).map(
            lambda v: {"member0": v}
        )
        | st.text(max_size=6).map(lambda s: {"member1": s}),
        max_size=4,
    ),
)
@settings(max_examples=200, deadline=None)
def test_avro_codec_roundtrip_property(
    image, echo, op, tags, attrs, status, checksum, fee, payload, samples,
    wrapped, props,
):
    """decode(encode(x)) == x for the full supported type surface —
    nested null-union records (Debezium's before/after shape), zigzag
    longs across the entire int64 range, exact decimals, micro
    timestamps, dates, unicode strings, raw bytes, IEEE doubles,
    arrays of records + string-keyed maps (r9), and (r10) enums,
    fixeds (raw and decimal-annotated), multi-type unions (memberN
    values over long/string/enum branches), nullable array items,
    union-typed map values, and (r11) single-branch union wrappers
    (the wire keeps the index varint).  Hypothesis hunts the boundary values a
    hand-written table misses (two's-complement byte-length edges,
    10-byte varints, empty strings/bytes, astral-plane unicode, empty
    containers, all-null element runs)."""
    from ultimate_data_engineering_project_spark.sources import avro_py

    fields = avro_py.parse_flat_schema(_AVRO_PROP_SCHEMA)
    row = (
        image, echo, op, tags, attrs,
        status, checksum, fee, payload, samples, wrapped, props,
    )
    out = avro_py.decode_record(avro_py.encode_record(row, fields), fields)
    assert out == row


_EVO_WRITER = """
{"type": "record", "name": "r", "fields": [
  {"name": "id", "type": "long"},
  {"name": "st", "type": {"type": "enum", "name": "St",
     "symbols": ["A", "B"]}},
  {"name": "u", "type": ["null", "long"]},
  {"name": "m", "type": ["null", "long", "string"]},
  {"name": "dc", "type": {"type": "array", "items": {
     "type": "record", "name": "D", "fields": [
       {"name": "n", "type": "string"},
       {"name": "cnt", "type": "int"}]}}},
  {"name": "mv", "type": {"type": "map", "values": "int"}}
]}
"""
# reader: widened enum, reordered+widened unions (r11) + r12 container
# evolution — the array's ELEMENT record gained a defaulted field and
# promoted cnt int->long, and the map's values promoted int->double —
# every recursive resolution case in one schema history
_EVO_READER = """
{"type": "record", "name": "r", "fields": [
  {"name": "id", "type": "long"},
  {"name": "st", "type": {"type": "enum", "name": "St",
     "symbols": ["A", "B", "C"]}},
  {"name": "u", "type": ["string", "null", "long"]},
  {"name": "m", "type": ["boolean", "null", "string", "long"]},
  {"name": "region", "type": "string", "default": "emea"},
  {"name": "dc", "type": {"type": "array", "items": {
     "type": "record", "name": "D", "fields": [
       {"name": "n", "type": "string"},
       {"name": "cnt", "type": "long"},
       {"name": "src", "type": "string", "default": "cdc"}]}}},
  {"name": "mv", "type": {"type": "map", "values": "double"}},
  {"name": "meta", "type": {"type": "record", "name": "Meta", "fields": [
     {"name": "gen", "type": "long", "default": 0},
     {"name": "tags", "type": {"type": "array", "items": "string"},
      "default": ["a"]}]},
   "default": {"gen": 9}},
  {"name": "op", "type": {"type": "enum", "name": "Op",
     "symbols": ["c", "u", "d"]}, "default": "c"},
  {"name": "attrs", "type": {"type": "map", "values": "long"},
   "default": {"k": 3}},
  {"name": "hist", "type": {"type": "array", "items": {
     "type": "record", "name": "H", "fields": [
       {"name": "x", "type": "long", "default": 1}]}},
   "default": [{}, {"x": 5}]}
]}
"""


@given(
    ident=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    status=st.sampled_from(["A", "B"]),
    u=st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
    m=st.none()
    | st.integers(min_value=-(2**63), max_value=2**63 - 1).map(
        lambda v: {"member0": v}
    )
    | st.text(max_size=10).map(lambda s: {"member1": s}),
    dc=st.lists(
        st.tuples(
            st.text(max_size=6),
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
        ).map(lambda t: {"n": t[0], "cnt": t[1]}),
        max_size=4,
    ),
    mv=st.dictionaries(
        st.text(max_size=4),
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        max_size=4,
    ),
)
@settings(max_examples=120, deadline=None)
def test_avro_evolution_alignment_property(ident, status, u, m, dc, mv):
    """r11+r12 evolution fuzz: every value a v1 writer can emit aligns
    to a reader with a WIDENED enum, WIDENED+REORDERED unions, an
    array whose ELEMENT record evolved (added defaulted field + cnt
    int->long promotion), a map whose values promoted int->double,
    and (r13) four reader-ADDED fields with COMPOSITE defaults
    (record/enum/map/array-of-record, converted at plan time)
    — the enum symbol string survives as-is, the plain nullable union
    lifts into the reader's memberN struct at the matched branch
    position, multi-union member indexes re-map by branch identity,
    and container elements convert per item/value.  The writer's own
    decode is the baseline, so any drift between the aligner's remap
    tables and the codec's surfacing fails here."""
    from ultimate_data_engineering_project_spark.sources import avro_py

    _, writers = avro_py.build_writer_aligners(
        {1: _EVO_WRITER, 2: _EVO_READER}, _EVO_READER
    )
    wf, align = writers[1]
    got = tuple(align(avro_py.decode_record(
        avro_py.encode_record((ident, status, u, m, dc, mv), wf), wf
    )))
    # reader non-null branch orders: u -> (string, long); m ->
    # (boolean, string, long)
    want_u = None if u is None else {"member1": u}
    if m is None:
        want_m = None
    elif "member0" in m:  # writer long -> reader member2
        want_m = {"member2": m["member0"]}
    else:  # writer string -> reader member1
        want_m = {"member1": m["member1"]}
    want_dc = [{"n": d["n"], "cnt": d["cnt"], "src": "cdc"} for d in dc]
    want_mv = {k: float(v) for k, v in mv.items()}
    # r13 composite reader defaults, converted at plan time: record
    # default with the absent field taking its own default, enum
    # symbol, map values, and array-of-record items where an empty
    # JSON object backfills the element record's own field defaults
    want_meta = {"gen": 9, "tags": ["a"]}
    want_hist = [{"x": 1}, {"x": 5}]
    assert got == (ident, status, want_u, want_m, "emea", want_dc,
                   want_mv, want_meta, "c", {"k": 3}, want_hist)


rollup_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),            # day offset
        st.sampled_from(["click", "view", None]),          # event_type
        st.one_of(st.none(), st.floats(-1e5, 1e5).map(lambda x: round(x, 4))),
    ),
    min_size=1,
    max_size=30,
)


@given(
    ev=rollup_events_strategy,
    n_slices=st.integers(min_value=1, max_value=3),
    assign=st.randoms(use_true_random=False),
)
@settings(**{**_SETTINGS, "max_examples": 6})
def test_rollup_merge_slice_invariant(spark, ev, n_slices, assign):
    """Continuous-aggregate algebra: merging rollup_partials over ANY
    random slicing of the events (including empty slices and rows with
    null types/values) equals merging one partial over everything —
    the property that makes incremental maintenance exact."""
    from ultimate_data_engineering_project_spark.operators import aggregates

    rows = [
        Row(eid=i, ts=BASE + datetime.timedelta(days=d, hours=i % 24),
            event_type=t, value=v)
        for i, (d, t, v) in enumerate(ev)
    ]
    # explicit schema: hypothesis happily samples an all-None column,
    # which createDataFrame cannot infer a type for
    df = spark.createDataFrame(
        rows, "eid long, ts timestamp, event_type string, value double"
    )
    kw = dict(ts_col="ts", key_cols=("event_type",), value_col="value")

    def rows_of(out):
        return sorted(
            ((r["bucket_ts"], r["event_type"], r["n_events"], r["n_valued"],
              r["total_value"], r["min_value"], r["max_value"], r["avg_value"])
             for r in out.collect()),
            key=str,
        )

    want = rows_of(aggregates.merge_rollup(aggregates.rollup_partials(df, **kw)))

    labels = [assign.randrange(n_slices) for _ in rows]
    parts = None
    hparts = None
    hkw = dict(ts_col="ts", key_cols=("event_type",), value_col="value",
               bins=8, lo=-1e5, hi=1e5)
    for s in range(n_slices):
        ids = [r.eid for r, l in zip(rows, labels) if l == s]
        sl = df.where(F.col("eid").isin(ids) if ids else F.lit(False))
        p = aggregates.rollup_partials(sl, **kw)
        parts = p if parts is None else parts.unionByName(p)
        hp = aggregates.hist_partials(sl, **hkw)
        hparts = hp if hparts is None else hparts.unionByName(hp)
    got = rows_of(aggregates.merge_rollup(parts))
    assert got == want

    # r9: the HISTOGRAM partials carry the same slice-invariance (the
    # property that makes the percentile continuous aggregate exact):
    # served quantiles over any slicing == over one direct partial
    def hrows(out):
        return sorted(map(tuple, out.collect()), key=str)

    hq = dict(bins=8, lo=-1e5, hi=1e5)
    hwant = hrows(
        aggregates.hist_quantiles(aggregates.hist_partials(df, **hkw), (50, 95), **hq)
    )
    assert hrows(aggregates.hist_quantiles(hparts, (50, 95), **hq)) == hwant


# --- composite reader-default conversion (r13 judge ask #5) -----------

@st.composite
def _default_tree(draw, depth=0, name_seq=None):
    """A random (raw Avro type decl, JSON default value, expected
    decoded constant) triple, recursing through record/array/map up to
    depth 2 — the generator mirrors the Avro spec's Default values
    rules so `_default_const`'s plan-time conversion can be checked
    against an independently computed expectation."""
    if name_seq is None:
        name_seq = iter(range(10_000))
    kinds = ["long", "string", "boolean", "enum",
             "bytes", "decimal", "date"]
    if depth < 2:
        kinds += ["record", "array", "map"]
    kind = draw(st.sampled_from(kinds))
    if kind == "long":
        v = draw(st.integers(min_value=-(2**40), max_value=2**40))
        return "long", v, v
    if kind == "string":
        v = draw(st.text(max_size=8))
        return "string", v, v
    if kind == "boolean":
        v = draw(st.booleans())
        return "boolean", v, v
    if kind == "bytes":
        # r14: the spec's latin-1 default encoding — JSON string code
        # points 0-255 map one-to-one to byte values
        raw = draw(st.binary(max_size=8))
        return "bytes", raw.decode("latin-1"), raw
    if kind == "decimal":
        # r14: decimal logical defaults are the latin-1 string of the
        # two's-complement unscaled value (Debezium NUMERIC DEFAULT)
        import decimal as _dec

        scale = draw(st.integers(min_value=0, max_value=4))
        unscaled = draw(
            st.integers(min_value=-(2**30), max_value=2**30)
        )
        nbytes = ((unscaled + (1 if unscaled < 0 else 0)).bit_length()
                  // 8) + 1
        raw = unscaled.to_bytes(nbytes, "big", signed=True)
        decl = {"type": "bytes", "logicalType": "decimal",
                "precision": 15, "scale": scale}
        want = _dec.Decimal(unscaled).scaleb(-scale)
        return decl, raw.decode("latin-1"), want
    if kind == "date":
        import datetime as _dt

        days = draw(st.integers(min_value=-30_000, max_value=60_000))
        decl = {"type": "int", "logicalType": "date"}
        return decl, days, _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
    if kind == "enum":
        syms = draw(
            st.lists(
                st.sampled_from(["c", "u", "d", "r", "t"]),
                min_size=1, max_size=4, unique=True,
            )
        )
        v = draw(st.sampled_from(syms))
        decl = {
            "type": "enum",
            "name": f"E{next(name_seq)}",
            "symbols": syms,
        }
        return decl, v, v
    if kind == "array":
        item_decl, item_v, item_want = draw(
            _default_tree(depth=depth + 1, name_seq=name_seq)
        )
        n = draw(st.integers(min_value=0, max_value=3))
        decl = {"type": "array", "items": item_decl}
        return decl, [item_v] * n, [item_want] * n
    if kind == "map":
        val_decl, val_v, val_want = draw(
            _default_tree(depth=depth + 1, name_seq=name_seq)
        )
        keys = draw(
            st.lists(
                st.sampled_from(["k1", "k2", "k3"]),
                max_size=3, unique=True,
            )
        )
        decl = {"type": "map", "values": val_decl}
        return decl, {k: val_v for k in keys}, {k: val_want for k in keys}
    # record: 1-3 fields, each present in the default object, absent
    # with its OWN default, or absent-and-nullable (expected None)
    n_fields = draw(st.integers(min_value=1, max_value=3))
    fields, dflt, want = [], {}, {}
    for i in range(n_fields):
        fname = f"f{depth}_{i}"
        f_decl, f_v, f_want = draw(
            _default_tree(depth=depth + 1, name_seq=name_seq)
        )
        mode = draw(st.sampled_from(["present", "own_default", "null"]))
        if mode == "present":
            fields.append({"name": fname, "type": f_decl})
            dflt[fname] = f_v
            want[fname] = f_want
        elif mode == "own_default":
            fields.append(
                {"name": fname, "type": f_decl, "default": f_v}
            )
            want[fname] = f_want
        else:  # absent nullable -> NULL backfill
            fields.append({"name": fname, "type": ["null", f_decl]})
            want[fname] = None
    decl = {
        "type": "record",
        "name": f"R{next(name_seq)}",
        "fields": fields,
    }
    return decl, dflt, want


@given(tree=_default_tree())
@settings(max_examples=150, deadline=None)
def test_avro_composite_default_conversion_property(tree):
    """r13 composite-default fuzz: for ANY generated type tree and
    spec-conforming JSON default, a reader that ADDS the field
    converts the default to exactly the independently-computed decoded
    constant at plan time — records recurse through present / own-
    default / absent-nullable field modes, arrays and maps element by
    element, enums by symbol.  The writer never emitted the field, so
    the aligned row is [id, <converted const>]."""
    import json as _json

    from ultimate_data_engineering_project_spark.sources import avro_py

    decl, dflt, want = tree
    v1 = _json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}]})
    reader = _json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "x", "type": decl, "default": dflt}]})
    _, writers = avro_py.build_writer_aligners({1: v1}, reader)
    wf, align = writers[1]
    assert align([7]) == [7, want]
