"""Driver contract for the spark-graft builder (PySpark target).

Every entry exercises the trafaret_spark library surface (SURVEY.md §2):
validation/coercion guards (§2.1) over the driver's tables, the dataflow
operators E4-E10 (as-of join, lag/rolling/sessionize/backfill, aggregates)
over `events`, and the training-data ops (dedup, similarity, text analysis,
multimodal plumbing) over `documents`/`embeddings`.

Column-name and type parity with ``oracle_sql()`` is load-bearing: every
computed column is aliased identically on both sides, doubles are rounded to
stable precision, and int widths are pinned (BIGINT ⇔ long).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

import trafaret_spark as ts
from trafaret_spark.operators import (conversations, dedup, features,
                                      lmscore, multimodal, retrieval,
                                      sampling, similarity, textstats)
from trafaret_spark.operators.asof import asof_join

EVENT_TYPES = ["click", "view", "signup", "purchase"]  # 'error' fails the Enum
_TOOLS = ["search", "code", "browse"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _err_code(errors_col: str = "errors"):
    # try_element_at: the errors array is EMPTY for valid rows, and the
    # driver session may run with spark.sql.ansi.enabled=true (Spark 4
    # default), where plain element_at throws on out-of-bounds
    return F.try_element_at(F.col(errors_col), F.lit(1))["code"].alias("err_code")


# --------------------------------------------------------------------------
# §2.1 validation / coercion guards
# --------------------------------------------------------------------------

def q_v_enum_role(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    schema = ts.Schema(
        ts.Key("event_id", ts.Int(gte=0)),
        ts.Key("event_type", ts.Enum(*EVENT_TYPES)),
        extras="ignore")
    out = schema.apply(ev)
    return out.select("event_id", "event_type",
                      (F.size("errors") == 0).alias("valid"), _err_code())


def q_v_string_len(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    schema = ts.Schema(
        ts.Key("doc_id", ts.Int()),
        ts.Key("text", ts.String(min_length=50, max_length=300)),
        extras="ignore")
    return schema.apply(docs).select("doc_id", _err_code())


def q_v_toint(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k_str = F.regexp_extract("props", r'"k": (\d+)', 1)
    raw = (F.when(F.col("event_id") % 13 == 0, F.concat(k_str, F.lit(".5")))
           .when(F.col("event_id") % 17 == 0, F.concat(F.lit("x"), k_str))
           .otherwise(k_str))
    df = ev.select("event_id", raw.alias("k_raw"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("k_raw", ts.ToInt(), to_name="k_int"),
                    extras="ignore").apply(df)
    return out.select("event_id", "k_int", _err_code())


def q_v_tofloat_bounds(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("value", ts.ToFloat(gte=5.0, lte=95.0), to_name="val"),
                    extras="ignore").apply(ev)
    return out.select("event_id", F.round("val", 6).alias("val"), _err_code())


def q_v_tobool(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    opts = F.array(*[F.lit(x) for x in ["true", "0", "YES", "off", "none", "bogus"]])
    raw = F.element_at(opts, (F.col("event_id") % 6 + 1).cast("int"))
    df = ev.select("event_id", raw.alias("raw"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("raw", ts.Any()),
                    ts.Key("raw", ts.ToBool(), to_name="b"),
                    extras="ignore").apply(df)
    return out.select("event_id", "raw", "b", _err_code())


def q_v_or_null(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    tool = (F.when(F.col("event_id") % 11 == 0, F.lit(None).cast("string"))
            .when(F.col("event_id") % 11 == 1, F.lit("hammer"))
            .otherwise(F.element_at(F.array(*[F.lit(t) for t in _TOOLS]),
                                    (F.col("event_id") % 3 + 1).cast("int"))))
    df = ev.select("event_id", tool.alias("tool"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("tool", ts.Any()),
                    ts.Key("tool", ts.Enum(*_TOOLS) | ts.Null(), to_name="tool_checked"),
                    extras="ignore").apply(df)
    return out.select("event_id", "tool", "tool_checked",
                      (F.size("errors") == 0).alias("valid"), _err_code())


def q_v_todatetime(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    raw = (F.when(F.col("event_id") % 19 == 0, F.date_format("ts", "dd-MM-yyyy"))
           .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss")))
    df = ev.select("event_id", raw.alias("ts_raw"))
    out = ts.Schema(
        ts.Key("event_id", ts.Int()),
        ts.Key("ts_raw", ts.ToDateTime(format="%Y-%m-%d %H:%M:%S"), to_name="ts_parsed"),
        extras="ignore").apply(df)
    return out.select("event_id", "ts_parsed", _err_code())


def q_v_regexp(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ts.Schema(ts.Key("doc_id", ts.Int()),
                    ts.Key("source", ts.Regexp(r"src(\d+)"), to_name="src_num"),
                    extras="ignore").apply(docs)
    return out.select("doc_id", "src_num", _err_code())


def q_v_key_default(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    df = ev.select("event_id")
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("channel", ts.String(), default="web"),
                    extras="ignore").apply(df)
    return out.select("event_id", "channel")


def q_v_list(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    df = ev.select("event_id",
                   F.sequence(F.lit(1), (F.col("event_id") % 5 + 1).cast("int"))
                   .cast("array<bigint>").alias("xs"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("xs", ts.List(ts.Int(lte=3), max_length=4))).apply(df)
    return out.select(
        "event_id",
        F.when(F.col("xs").isNotNull(), F.size("xs")).alias("n_xs"),
        _err_code())


def q_v_tuple(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    df = ev.select("event_id", F.struct("user_id", "event_type").alias("pair"))
    out = ts.Schema(
        ts.Key("event_id", ts.Int()),
        ts.Key("pair", ts.Tuple(ts.Int(gte=0), ts.Enum(*EVENT_TYPES)))).apply(df)
    return out.select("event_id",
                      F.col("pair")["user_id"].alias("uid"),
                      F.col("pair")["event_type"].alias("etype"), _err_code())


def q_v_mapping(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    df = ev.select("event_id", F.create_map("event_type", "value").alias("m"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("m", ts.Mapping(ts.String(), ts.Float(lte=100.0)))).apply(df)
    return out.select("event_id",
                      F.try_element_at(F.map_keys("m"), F.lit(1)).alias("mkey"),
                      _err_code())


def q_v_email(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    addr = (F.when(F.col("event_id") % 7 == 0, F.lit("not an email"))
            .otherwise(F.concat(F.lit("user"), F.col("event_id"),
                                F.lit("@example.com"))))
    df = ev.select("event_id", addr.alias("addr"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("addr", ts.Email())).apply(df)
    return out.select("event_id", "addr", _err_code())


def q_v_atom_onerror(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    chan = F.when(F.col("event_id") % 4 == 0, F.lit("app")).otherwise(F.lit("web"))
    df = ev.select("event_id", chan.alias("chan"))
    out = ts.Schema(
        ts.Key("event_id", ts.Int()),
        ts.Key("chan", ts.OnError(ts.Atom("web"), "must be web",
                                  code="bad_channel"))).apply(df)
    return out.select("event_id", "chan", _err_code())


def q_v_construct(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    df = ev.select("event_id", F.col("value").cast("string").alias("value"),
                   "event_type")
    schema = ts.construct({"event_id": int, "value": float, "event_type": str})
    out = schema.apply(df)
    return out.select("event_id", F.round("value", 6).alias("value"),
                      "event_type", _err_code())


def q_v_xor_key(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    a = F.when(F.col("event_id") % 3 == 0, F.col("value"))
    b = F.when(F.col("event_id") % 2 == 0, F.col("value") * 2)
    df = ev.select("event_id", a.alias("a"), b.alias("b"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.xor_key("a", "b", ts.Float(), to_name="ab")).apply(df)
    return out.select("event_id", F.round("ab", 6).alias("ab"), _err_code())


def q_v_keyssubset(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    df = ev.select("event_id",
                   F.concat(F.lit("u"), F.col("user_id")).alias("first"),
                   F.concat(F.lit("x"), F.col("event_id")).alias("last"))
    out = ts.Schema(
        ts.Key("event_id", ts.Int()),
        ts.KeysSubset("first", "last",
                      transform=lambda f, l: {"name": F.concat_ws(" ", f, l)})
    ).apply(df)
    return out.select("event_id", "name")


def q_v_mongoid(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    raw = (F.when(F.col("event_id") % 13 == 0, F.lit("not-hex"))
           .otherwise(F.substring(F.md5(F.col("event_id").cast("string")), 1, 24)))
    df = ev.select("event_id", raw.alias("oid"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("oid", ts.MongoId())).apply(df)
    return out.select("event_id", "oid", _err_code())


def q_v_bytes(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = ts.Schema(ts.Key("doc_id", ts.Int()),
                    ts.Key("text", ts.ToBytes(), to_name="payload"),
                    extras="ignore").apply(docs)
    return out.select("doc_id", F.length("payload").alias("n_bytes"), _err_code())


def q_v_types(spark, sf_dir):
    """Bool + Type/Subclass (plan-time dtype checks) + WithRepr passthrough."""
    ev = _t(spark, sf_dir, "events")
    df = ev.select(
        "event_id",
        F.when(F.col("event_id") % 5 != 0, F.col("event_id") % 2 == 0).alias("flag"),
        "event_type", "value")
    from pyspark.sql import types as T
    out = ts.Schema(
        ts.Key("event_id", ts.Int()),
        ts.Key("flag", ts.Bool()),
        ts.Key("event_type", ts.WithRepr(ts.Type(str), "<str>")),
        ts.Key("value", ts.Subclass(T.NumericType)),
    ).apply(df)
    return out.select("event_id", "flag", _err_code())


def q_v_date(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    raw = (F.when(F.col("event_id") % 23 == 0, F.lit("not-a-date"))
           .otherwise(F.date_format("ts", "yyyy-MM-dd")))
    df = ev.select("event_id", raw.alias("d_raw"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("d_raw", ts.ToDate(), to_name="d"),
                    extras="ignore").apply(df)
    # ISO string form: pandas renders Spark DATE as datetime.date but a
    # DuckDB DATE as a midnight Timestamp — strings compare canonically
    return out.select("event_id",
                      F.date_format("d", "yyyy-MM-dd").alias("d"), _err_code())


def q_v_datetime_any(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    m = F.col("event_id") % 4
    raw = (F.when(m == 0, F.date_format("ts", "yyyy/MM/dd HH:mm:ss"))
           .when(m == 1, F.date_format("ts", "dd.MM.yyyy"))
           .when(m == 2, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
           .otherwise(F.lit("garbage")))
    df = ev.select("event_id", raw.alias("ts_raw"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("ts_raw", ts.DateTimeAny(), to_name="ts_any"),
                    extras="ignore").apply(df)
    return out.select("event_id", "ts_any", _err_code())


def q_v_todecimal(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    num = F.concat((F.col("event_id") % 1000).cast("string"), F.lit("."),
                   F.lpad((F.col("event_id") % 97).cast("string"), 2, "0"))
    raw = F.when(F.col("event_id") % 9 == 0, F.lit("abc")).otherwise(num)
    df = ev.select("event_id", raw.alias("d_raw"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("d_raw", ts.ToDecimal(gte=1.0), to_name="d"),
                    extras="ignore").apply(df)
    return out.select("event_id",
                      F.round(F.col("d").cast("double"), 6).alias("d"),
                      _err_code())


def q_v_bytes_guards(spark, sf_dir):
    """Bytes (+ AnyString binary dispatch) with String length policy."""
    docs = _t(spark, sf_dir, "documents")
    df = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    out = ts.Schema(
        ts.Key("doc_id", ts.Int()),
        ts.Key("payload", ts.Bytes(min_length=50, max_length=300)),
        ts.Key("payload", ts.AnyString(), to_name="payload2"),
    ).apply(df)
    return out.select("doc_id",
                      F.length("payload").alias("n_bytes"), _err_code())


def q_v_frombytes(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    df = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    out = ts.Schema(ts.Key("doc_id", ts.Int()),
                    ts.Key("payload", ts.FromBytes("utf-8"), to_name="text2")
                    ).apply(df)
    return out.select("doc_id", "text2", _err_code())


def q_v_url_hex(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    url = (F.when(F.col("event_id") % 7 == 0, F.lit("notaurl"))
           .otherwise(F.concat(F.lit("https://example.com/p/"),
                               F.col("event_id"))))
    hx = (F.when(F.col("event_id") % 11 == 0, F.lit("XYZ"))
          .otherwise(F.substring(F.md5(F.col("event_id").cast("string")), 1, 16)))
    safe = F.concat(F.lit("tok_"), F.col("event_id"))
    df = ev.select("event_id", url.alias("url"), hx.alias("hx"),
                   safe.alias("tok"))
    out = ts.Schema(
        ts.Key("event_id", ts.Int()),
        ts.Key("url", ts.URL()),
        ts.Key("hx", ts.Hex()),
        ts.Key("tok", ts.URLSafe()),
    ).apply(df)
    codes_str = F.concat_ws(
        ",", F.transform(F.col("errors"), lambda e: e["code"]))
    return out.select("event_id", "url", "hx", codes_str.alias("err_codes"))


def q_v_ip(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    ip4 = F.concat(F.lit("10.0.0."), (F.col("event_id") % 300).cast("string"))
    mixed = (F.when(F.col("event_id") % 3 == 0, F.lit("::1"))
             .otherwise(ip4))
    df = ev.select("event_id", ip4.alias("ip4"), mixed.alias("ip"))
    out = ts.Schema(
        ts.Key("event_id", ts.Int()),
        ts.Key("ip4", ts.IPv4()),
        ts.Key("ip", ts.IP()),
    ).apply(df)
    codes_str = F.concat_ws(
        ",", F.transform(F.col("errors"), lambda e: e["code"]))
    return out.select("event_id", "ip4", codes_str.alias("err_codes"))


def q_v_confirm_key(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    pw = F.concat(F.lit("p"), F.col("event_id"))
    pw2 = (F.when(F.col("event_id") % 13 == 0, F.lit(None).cast("string"))
           .when(F.col("event_id") % 6 == 0, F.lit("different"))
           .otherwise(pw))
    df = ev.select("event_id", pw.alias("pw"), pw2.alias("pw2"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.confirm_key("pw", "pw2", ts.String())).apply(df)
    return out.select("event_id", "pw", _err_code())


def q_v_subdict(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    df = ev.select("event_id",
                   F.concat(F.lit("u"), F.col("user_id")).alias("first"),
                   F.concat(F.lit("x"), F.col("event_id")).alias("last"))
    out = ts.Schema(
        ts.Key("event_id", ts.Int()),
        ts.subdict("full", ts.Key("first", ts.String()),
                   ts.Key("last", ts.String(max_length=4)),
                   combine=lambda f, l: F.concat_ws(" ", f, l)),
    ).apply(df)
    return out.select("event_id", "full", _err_code())


def q_v_dictkeys(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    df = ev.select("event_id")  # event_type column absent → required
    out = ts.DictKeys(["event_id", "event_type"]).apply(df)
    return out.select("event_id", _err_code())


def q_v_forward(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    name = (F.when(F.col("event_id") % 5 == 0, F.lit("x"))  # too short
            .otherwise(F.concat(F.lit("node"), F.col("event_id"))))
    kid_name = (F.when(F.col("event_id") % 7 == 0, F.lit("k"))
                .otherwise(F.lit("kid-ok")))
    df = ev.select(
        "event_id",
        F.struct(name.alias("name"),
                 F.array(F.struct(kid_name.alias("name"))).alias("kids"))
        .alias("node"))
    node = ts.Forward()
    node << ts.DictGuard(ts.Key("name", ts.String(min_length=2)),
                         ts.Key("kids", ts.List(node), optional=True))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("node", node)).apply(df)
    return out.select("event_id",
                      F.col("node")["name"].alias("name"), _err_code())


def q_v_call(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 10 == 0, F.lit("")) \
        .otherwise(F.col("event_type"))
    df = ev.select("event_id", raw.alias("etype"))

    def upper_nonempty(s):
        errs = s.map(lambda v: None if v else "empty value")
        return s.str.upper(), errs

    out = ts.Schema(
        ts.Key("event_id", ts.Int()),
        ts.Key("etype", ts.Call(upper_nonempty, "string"), to_name="up"),
    ).apply(df)
    return out.select("event_id", "up", _err_code())


def q_reshape_fold(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    flat = docs.select("doc_id", F.col("lang").alias("meta__lang"),
                       F.col("source").alias("meta__source"))
    folded = ts.fold(flat)
    return folded.select("doc_id", F.col("meta")["lang"].alias("lang2"),
                         F.col("meta")["source"].alias("source2"))


def q_v_metrics(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    schema = ts.Schema(
        ts.Key("event_id", ts.Int(gte=0)),
        ts.Key("event_type", ts.Enum(*EVENT_TYPES)),
        ts.Key("value", ts.ToFloat(gte=5.0)),
        extras="ignore")
    out = ts.validation_metrics(ts.apply_schema(ev, schema))
    return out.select("path", "code", F.col("n_rows").cast("long").alias("n_rows"))


def q_reshape_unfold(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    nested = docs.select("doc_id", F.struct("lang", "source").alias("meta"))
    return ts.unfold(nested)


# --------------------------------------------------------------------------
# E5-E10: windowed point-in-time features over `events`
# (key = user_id, order = event_id — equivalent to ts order, unique)
# --------------------------------------------------------------------------

def _feat(by="user_id", order="event_id", ts_col="ts"):
    return features.Features(by=by, order=order, ts=ts_col)


def q_f_lag(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = _feat().lag("value", 1).lag("event_type", 2, name="etype_lag2").apply(ev)
    return out.select("event_id", "user_id", "value_lag1", "etype_lag2")


def q_f_rolling(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = (_feat().rolling("value", "avg", 3, name="val_avg3")
           .rolling("value", "max", 5, name="val_max5").apply(ev))
    return out.select("event_id", F.round("val_avg3", 6).alias("val_avg3"),
                      F.round("val_max5", 6).alias("val_max5"))


def q_f_rolling_time(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = _feat().rolling_time("value", "sum", 3600, name="val_sum1h").apply(ev)
    return out.select("event_id", F.round("val_sum1h", 6).alias("val_sum1h"))


def q_f_cum(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = (_feat().cum("value", "sum", name="val_cumsum")
           .cum("value", "count", name="n_seen").apply(ev))
    return out.select("event_id", F.round("val_cumsum", 6).alias("val_cumsum"),
                      F.col("n_seen").cast("long").alias("n_seen"))


def q_f_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = _feat().session_id(1800, name="session_id").apply(ev)
    return out.select("event_id", "user_id",
                      F.col("session_id").cast("long").alias("session_id"))


def q_f_backfill(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    df = ev.withColumn("purchase_value",
                       F.when(F.col("event_type") == "purchase", F.col("value")))
    out = _feat().backfill("purchase_value", name="last_purchase").apply(df)
    return out.select("event_id", F.round("last_purchase", 6).alias("last_purchase"))


def q_f_session_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    sess = _feat().session_id(1800, name="session_id").apply(ev)
    out = features.session_stats(sess, by="user_id", session_col="session_id", ts="ts")
    return out.select("user_id", F.col("session_id").cast("long").alias("session_id"),
                      F.col("n_turns").cast("long").alias("n_turns"),
                      "session_start", "session_end",
                      F.col("duration_us").cast("long").alias("duration_us"))


def q_f_salted_agg(spark, sf_dir):
    # the value is summed as DECIMAL so the two-phase (salted) sum is EXACT
    # and independent of partial-agg grouping order — double addition is
    # non-associative and a re-salted sum can land on the other side of a
    # round() boundary vs the oracle (observed: 58.5557 vs 58.5558)
    from trafaret_spark import partitioning
    ev = _t(spark, sf_dir, "events") \
        .withColumn("value", F.col("value").cast("decimal(18,6)"))
    out = partitioning.salted_agg(
        ev, "user_id",
        {"n_events": ("count", "event_id"),
         "val_sum": ("sum", "value"),
         "val_max": ("max", "value")},
        buckets=8)
    return out.select("user_id",
                      F.col("n_events").cast("long").alias("n_events"),
                      F.round(F.col("val_sum").cast("double"), 4).alias("val_sum"),
                      F.round(F.col("val_max").cast("double"), 6).alias("val_max"),
                      F.round(F.col("val_sum").cast("double")
                              / F.col("n_events"), 4).alias("val_avg"))


# --------------------------------------------------------------------------
# E4: as-of joins (left = view events, right = purchase events, by user)
# --------------------------------------------------------------------------

def _asof_sides(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "view") \
        .select("event_id", "user_id", "ts", "value")
    right = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "value")
    return left, right


def q_asof_backward(spark, sf_dir):
    left, right = _asof_sides(spark, sf_dir)
    out = asof_join(left, right, on="ts", by="user_id",
                    direction="backward", suffix="_r")
    return out.select("event_id", F.round("value_r", 6).alias("value_r"))


def q_asof_forward(spark, sf_dir):
    left, right = _asof_sides(spark, sf_dir)
    out = asof_join(left, right, on="ts", by="user_id",
                    direction="forward", suffix="_r")
    return out.select("event_id", F.round("value_r", 6).alias("value_r"))


def q_asof_tolerance(spark, sf_dir):
    left, right = _asof_sides(spark, sf_dir)
    out = asof_join(left, right, on="ts", by="user_id",
                    direction="backward", tolerance=1800.0, suffix="_r")
    return out.select("event_id", F.round("value_r", 6).alias("value_r"))


def q_asof_broadcast(spark, sf_dir):
    left, right = _asof_sides(spark, sf_dir)
    out = asof_join(left, right, on="ts", by="user_id",
                    direction="backward", suffix="_r", strategy="broadcast")
    return out.select("event_id", F.round("value_r", 6).alias("value_r"))


# --------------------------------------------------------------------------
# training-data ops: dedup / text / similarity / multimodal
# --------------------------------------------------------------------------

def q_asof_nearest(spark, sf_dir):
    left, right = _asof_sides(spark, sf_dir)
    out = asof_join(left, right, on="ts", by="user_id",
                    direction="nearest", suffix="_r")
    return out.select("event_id", F.round("value_r", 6).alias("value_r"))


def q_asof_strict(spark, sf_dir):
    left, right = _asof_sides(spark, sf_dir)
    out = asof_join(left, right, on="ts", by="user_id", direction="backward",
                    allow_exact_matches=False, suffix="_r")
    return out.select("event_id", F.round("value_r", 6).alias("value_r"))


_MINHASH_PAIRS_CACHE: dict = {}


def _minhash_pairs(spark, sf_dir):
    """Memoized + persisted minhash near-dup pairs: dedup_minhash and
    dedup_components (registry neighbors) share one computation of the
    shingle→signature→band→verify pipeline instead of running it twice
    (r2 verdict #1: cut per-query fixed cost in the driver gate)."""
    key = (id(spark), sf_dir)
    df = _MINHASH_PAIRS_CACHE.get(key)
    if df is None:
        docs = _t(spark, sf_dir, "documents")
        df = dedup.minhash_dedup(docs, threshold=0.3, portable=True).persist()
        _MINHASH_PAIRS_CACHE[key] = df
    return df


def q_dedup_components(spark, sf_dir):
    pairs = _minhash_pairs(spark, sf_dir).select("a", "b")
    comp = dedup.connected_components(pairs)
    return comp.select(F.col("node").cast("long").alias("node"),
                       F.col("component").cast("long").alias("component"))


def q_dedup_keep_canonical(spark, sf_dir):
    # end-to-end dedup: corpus minus non-canonical members of each
    # minhash near-dup component (smallest doc_id survives)
    docs = _t(spark, sf_dir, "documents")
    pairs = _minhash_pairs(spark, sf_dir).select("a", "b")
    out = dedup.keep_canonical(docs, pairs)
    return out.select("doc_id", "lang")


def q_range_join(spark, sf_dir):
    from trafaret_spark.operators.rangejoin import range_join
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "view") \
        .select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id",
                (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("start"),
                (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
                "value")
    out = range_join(left, right, on="ts", by="user_id",
                     bucket_width=1800.0, suffix="_r")
    return out.select("event_id", F.round("value_r", 6).alias("value_r"))


def q_range_join_long(spark, sf_dir):
    # exercises BOTH paths in one result: per-user purchase intervals plus
    # one open-ended interval per user that spans > max_buckets_per_interval
    # buckets and takes the by-key long fallback (r4: bounded + observable).
    # on_long="ignore" keeps the driver query lazy (warn's count job and
    # the RuntimeWarning are pytest-covered).
    from trafaret_spark.operators.rangejoin import range_join
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "view") \
        .select("event_id", "user_id", "ts")
    short_iv = ev.filter(F.col("event_type") == "purchase") \
        .select("user_id",
                (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("start"),
                (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
                F.col("value"))
    long_iv = (ev.filter(F.col("event_type") == "signup")
               .groupBy("user_id")
               .agg(F.min("ts").alias("start"))
               .select("user_id", "start",
                       (F.col("start") + F.expr("INTERVAL 3650 DAYS")
                        ).alias("end"),
                       F.lit(-1.0).alias("value")))
    right = short_iv.unionByName(long_iv)
    out = range_join(left, right, on="ts", by="user_id",
                     bucket_width=1800.0, max_buckets_per_interval=1000,
                     suffix="_r", on_long="ignore")
    return (out.groupBy("event_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_matches"),
                 F.round(F.sum("value_r"), 6).alias("val_sum")))


def q_v_email_idna(spark, sf_dir):
    # deterministic unicode-domain addresses → the oracle hard-codes the
    # expected ACE form ('пример.рф' → 'xn--e1afmkfd.xn--p1ai'), so the
    # Arrow IDNA recheck path gets a hard driver attestation
    ev = _t(spark, sf_dir, "events")
    addr = (F.when(F.col("event_id") % 5 == 0, F.lit("ivan@пример.рф"))
            .when(F.col("event_id") % 5 == 1, F.lit("not an email"))
            .otherwise(F.concat(F.lit("user"), F.col("event_id"),
                                F.lit("@example.com"))))
    df = ev.select("event_id", addr.alias("addr"))
    out = ts.Schema(ts.Key("event_id", ts.Int()),
                    ts.Key("addr", ts.Email(idna=True))).apply(df)
    return out.select("event_id", "addr", _err_code())


def q_cur_decontaminate(spark, sf_dir):
    # benchmark = every 7th doc; corpus = the rest. n=3 portable grams so
    # the DuckDB oracle reproduces the hash family bit-for-bit; min_hits=2
    # exercises the threshold (1-gram brushes stay clean).
    from trafaret_spark.operators import curation
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    out = curation.ngram_decontaminate(corpus, bench, n=3, min_hits=2,
                                       portable=True)
    return out.select("doc_id",
                      F.col("n_grams").cast("long").alias("n_grams"),
                      F.col("n_hits").cast("long").alias("n_hits"),
                      F.round("overlap_frac", 6).alias("overlap_frac"),
                      "contaminated")


def q_cur_cap_per_key(spark, sf_dir):
    # per-(user, event_type) cap at 3 most-recent — runs the SALTED
    # two-phase path (salt_partitions=4) so the hot-key plan is what gets
    # attested; the oracle is the plain window definition the two-phase
    # plan must equal exactly.
    from trafaret_spark.operators import curation
    ev = _t(spark, sf_dir, "events")
    out = curation.cap_per_key(
        ev, ["user_id", "event_type"], n=3,
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
        salt_partitions=4, salt_col="event_id")
    return out.select("event_id", "user_id", "event_type")


def q_cur_pack(spark, sf_dir):
    # concat-and-chunk packing of the documents stream into 512-token
    # packs, sharded 4 ways — pure prefix-sum arithmetic, exactly
    # reproducible as a SQL cumulative window.
    from trafaret_spark.operators import curation, textstats
    docs = _t(spark, sf_dir, "documents") \
        .select("doc_id", F.pmod("doc_id", F.lit(4)).alias("shard"),
                textstats.token_count(F.col("text")).alias("n_tokens"))
    out = curation.pack_sequences(docs, capacity=512, token_col="n_tokens",
                                  order_by="doc_id", shard_col="shard")
    return out.select("doc_id", "shard",
                      F.col("pack_id").cast("long").alias("pack_id"),
                      F.col("offset").cast("long").alias("offset"),
                      "n_chunks")


def _transcript(spark, sf_dir):
    """Deterministic transcript-shaped frame (conv_id, turn_idx, role,
    text, ts, event_id) derived from `events` — the BASELINE input_hint
    shape, reproducible as a SQL CTE (`_TRANSCRIPT_CTE`) so every
    conversation-operator query gets a full value-level oracle. Every
    structural defect class is seeded on purpose so all five turn_errors
    codes fire on driver data: error→'tool' breaks alternation and opens
    conversations illegally; dropping event_id%53 rows AFTER ranking
    punches holes in turn_idx (turn_gap); shifting error-turn timestamps
    back an hour manufactures ts_regress without touching the (unique)
    turn_idx ordering key."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    t = ev.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("long")) \
        .filter(F.col("event_id") % 53 != 0)
    return t.select(
        F.col("user_id").cast("string").alias("conv_id"),
        "turn_idx",
        F.when(F.col("event_type") == "error", F.lit("tool"))
         .when(F.col("turn_idx") == 0, F.lit("system"))
         .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
         .otherwise(F.lit("assistant")).alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_type") == "error",
               F.col("ts") - F.expr("INTERVAL 1 HOUR"))
         .otherwise(F.col("ts")).alias("ts"),
        "event_id")


def q_conv_turn_errors(spark, sf_dir):
    # per-turn structural error codes, joined to a comma string so the
    # array contents (and their check order) are hash-attested
    t = _transcript(spark, sf_dir)
    out = conversations.turn_errors(t)
    return out.select("conv_id", "turn_idx", "role",
                      F.array_join("turn_errs", ",").alias("errs"))


def q_conv_report(spark, sf_dir):
    t = _transcript(spark, sf_dir)
    out = conversations.conversation_report(t)
    return out.select("conv_id", F.col("n_turns").cast("long").alias("n_turns"),
                      F.col("n_bad_turns").cast("long").alias("n_bad_turns"),
                      "first_err", "is_valid")


def q_conv_stutter(spark, sf_dir):
    # collapse consecutive repeated (role, first-char-of-text) turns —
    # the coarse text key manufactures real stutter runs in `events`
    t = _transcript(spark, sf_dir) \
        .withColumn("tkey", F.substring("text", 1, 1))
    out = conversations.dedup_stutter(t, text_col="tkey")
    return out.select("conv_id", "turn_idx", "role", "tkey")


def q_conv_truncate(spark, sf_dir):
    # head-truncate each conversation to a 120-codepoint budget at turn
    # boundaries (token_col = length(text))
    t = _transcript(spark, sf_dir) \
        .withColumn("n_tokens", F.length("text").cast("long"))
    out = conversations.truncate_turns(t, 120, token_col="n_tokens")
    return out.select("conv_id", "turn_idx", "n_tokens")


def q_conv_render(spark, sf_dir):
    # byte-equality surface: one deterministic render per conversation —
    # the DuckDB oracle's string_agg must agree on every byte
    t = _transcript(spark, sf_dir)
    out = conversations.render_conversation(t)
    return out.select("conv_id", F.col("n_turns").cast("long").alias("n_turns"),
                      F.col("n_chars").cast("long").alias("n_chars"),
                      "rendered")


def q_conv_dedup(spark, sf_dir):
    # exact conversation-level dedup over the render surface: the corpus
    # is the transcript UNION a '_copy'-suffixed clone of itself, so
    # every conversation has at least one whole-conversation duplicate
    # and the canonical (smallest conv_id) member must survive with its
    # turn rows byte-identical; conv_hash (md5 of the render) attested
    t = _transcript(spark, sf_dir).select("conv_id", "turn_idx", "role",
                                          "text")
    clone = t.withColumn("conv_id",
                         F.concat(F.col("conv_id"), F.lit("_copy")))
    # the corpus feeds BOTH the render/hash path and the survivor
    # join-back — persist so the events window isn't computed twice
    corpus = t.unionByName(clone).persist()
    out = conversations.dedup_conversations(corpus, keep_hash=True)
    return out.select("conv_id", "turn_idx", "role", "conv_hash")


def q_conv_features(spark, sf_dir):
    # per-conversation rollup features; latency stats aggregate exact
    # integer µs (sum/count/max of longs) so the oracle hash is stable
    # under partial-agg reordering
    t = _transcript(spark, sf_dir)
    out = conversations.conversation_features(t)
    return out.select(
        "conv_id", F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_user_turns").cast("long").alias("n_user_turns"),
        F.col("n_assistant_turns").cast("long").alias("n_assistant_turns"),
        F.col("n_other_turns").cast("long").alias("n_other_turns"),
        F.col("total_chars").cast("long").alias("total_chars"),
        "avg_turn_chars",
        F.col("n_responses").cast("long").alias("n_responses"),
        "avg_response_secs", "max_response_secs", "duration_secs")


def q_conv_neardup(spark, sf_dir):
    # NEAR-dup conversation dedup: corpus = transcript ∪ a '_v2' clone
    # with every 5th turn dropped, so each (x, x_v2) pair renders
    # DIFFERENTLY (exact conv_dedup keeps both) but its render
    # gram-Jaccard stays high; the whole-conversation minhash pass must
    # collapse each detected pair to the canonical (smaller) conv_id and
    # return the survivors' turn rows byte-identical. portable=True so
    # the DuckDB oracle reproduces the hash family bit-for-bit.
    t = _transcript(spark, sf_dir).select("conv_id", "turn_idx", "role",
                                          "text")
    clone = (t.filter(F.col("turn_idx") % 5 != 3)
             .withColumn("conv_id", F.concat(F.col("conv_id"),
                                             F.lit("_v2"))))
    corpus = t.unionByName(clone).persist()
    out = conversations.neardup_conversations(corpus, threshold=0.35,
                                              portable=True)
    return out.select("conv_id", "turn_idx", "role")


def q_conv_curate(spark, sf_dir):
    # the COMPOSED curation DAG (curation_pipeline.run_curation's operator
    # chain minus the write) attested value-level in ONE query, in
    # run_curation's EXACT stage order: stutter dedup (repair) →
    # structural quarantine (validate) → exact conv dedup → minhash
    # near-dup. Corpus = re-densified transcript ∪ an exact '_copy' clone
    # ∪ a '_v2' clone with every 7th turn's text edited (same structure,
    # so it survives the structural stage and must be caught by NEAR-dup).
    # Corpus construction: re-densify turn_idx, recompute the role from
    # the DENSIFIED parity (so the seeded event_id%53 row drops cannot
    # break alternation — otherwise EVERY conversation is invalid and the
    # dedup stages go vacuous), slice to the first 9 turns, then turn
    # turn 8 into a retry ECHO of turn 7 (same role+text) — the stutter
    # stage must remove it (leaving dense 0..7) or the echo's illegal
    # user→user transition quarantines the conversation: the planted
    # defect that makes BOTH the stutter stage and the repair-then-
    # validate order load-bearing. Validity is then controlled by the
    # remaining seeded defect: error-event rows keep their 1-hour-back
    # ts, so conversations with a close-spaced error event fail
    # ts_regress and the valid ones (×3 clone variants) flow through the
    # dedup chain.
    t = _transcript(spark, sf_dir).select("conv_id", "turn_idx", "text",
                                          "ts")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    di = (F.row_number().over(w) - 1).cast("long")
    sliced = (t.withColumn("turn_idx", di)
              .withColumn("role",
                          F.when(F.col("turn_idx") == 0, F.lit("system"))
                          .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
                          .otherwise(F.lit("assistant")))
              .filter(F.col("turn_idx") < 9))
    wd = Window.partitionBy("conv_id").orderBy("turn_idx")
    is_echo = F.col("turn_idx") == 8
    base = sliced.select(
        "conv_id", "turn_idx",
        F.when(is_echo, F.lag("role").over(wd))
        .otherwise(F.col("role")).alias("role"),
        F.when(is_echo, F.lag("text").over(wd))
        .otherwise(F.col("text")).alias("text"),
        "ts")
    exact = base.withColumn("conv_id", F.concat("conv_id", F.lit("_copy")))
    near = (base.withColumn(
        "text",
        F.when(F.col("turn_idx") % 7 == 3,
               F.concat(F.col("text"), F.lit(" edited")))
        .otherwise(F.col("text")))
        .withColumn("conv_id", F.concat("conv_id", F.lit("_v2"))))
    corpus = base.unionByName(exact).unionByName(near).persist()
    t1 = conversations.dedup_stutter(corpus)
    rep = conversations.conversation_report(t1)
    bad = rep.filter(~F.col("is_valid")).select("conv_id")
    t2 = t1.join(bad, ["conv_id"], "left_anti")
    t3 = conversations.dedup_conversations(t2)
    t4 = conversations.neardup_conversations(t3, threshold=0.35,
                                             portable=True)
    return t4.select("conv_id", "turn_idx", "role")


_BM25_QUERIES = [(1, "merge sort window dup"),
                 (2, "customer table join hash"),
                 (3, "vector stream data line")]


def q_ret_bm25(spark, sf_dir):
    # BM25 top-5 with the max_df_frac stopword cut live in the path
    # (0.79·N drops the handful of ~80%-df terms in the synthetic corpus;
    # 'dup' at df≈5% carries real idf discrimination)
    docs = _t(spark, sf_dir, "documents")
    qs = spark.createDataFrame(_BM25_QUERIES, ["query_id", "text"])
    out = retrieval.bm25_topk(docs, qs, k=5, max_df_frac=0.79)
    return out.select("query_id", "doc_id", F.col("rank").cast("int").alias("rank"),
                      "score")


def q_lm_bits(spark, sf_dir):
    # bigram LM trained on the doc_id%5==0 slice, scoring the rest —
    # quantized log-probs make the scores exact integers underneath
    docs = _t(spark, sf_dir, "documents")
    model = lmscore.train_bigram_lm(docs.filter(F.col("doc_id") % 5 == 0))
    out = lmscore.lm_score(docs.filter(F.col("doc_id") % 5 != 0), model)
    return out.select("doc_id", "n_bigrams", "bits_per_token")


# lm_bucket edges shared by q_lm_bucket and its oracle; chosen inside the
# sf0.01 bits range (~4.72-5.83, quartiles 4.96/5.02/5.08) so all three
# CCNet-style buckets are non-empty on driver data (non-vacuous)
_LM_EDGES = (4.99, 5.06)
_LM_LABELS = ("head", "middle", "tail")
# per-domain tercile quantiles for lm_bucket_edges: the SAME double
# literals flow into Spark's F.percentile and the oracle's quantile_cont
_LM_Q = (1.0 / 3.0, 2.0 / 3.0)


def q_lm_bucket(spark, sf_dir):
    # CCNet-style perplexity buckets over lm_score output, attested two
    # ways in ONE query slot: lm_bucket with FIXED global edges, and
    # lm_bucket_dom = the real CCNet recipe (per-DOMAIN tercile edges via
    # lm_bucket_edges + lm_bucket_by_key). Edge comparisons are exact in
    # both directions: bits_per_token is the SAME double in both engines
    # (quantized-integer sum, one normative division chain), and Spark's
    # exact F.percentile interpolation reproduces DuckDB quantile_cont
    # bit-for-bit (probed per-lang on driver data before wiring this)
    docs = _t(spark, sf_dir, "documents")
    model = lmscore.train_bigram_lm(docs.filter(F.col("doc_id") % 5 == 0))
    scored = lmscore.lm_score(docs.filter(F.col("doc_id") % 5 != 0), model) \
        .join(docs.select("doc_id", "lang"), ["doc_id"])
    out = lmscore.lm_bucket(scored, _LM_EDGES, labels=_LM_LABELS)
    edges = lmscore.lm_bucket_edges(out, by="lang", q=_LM_Q)
    out = lmscore.lm_bucket_by_key(out, edges, by="lang",
                                   labels=_LM_LABELS,
                                   out_col="lm_bucket_dom")
    return out.select("doc_id", "lang", "bits_per_token", "lm_bucket",
                      "lm_bucket_dom")


_BM25_IDX_ROOT: list = []  # [path] once created; atexit-removed


def _bm25_idx_dir() -> str:
    """One mkdtemp per PROCESS, removed at interpreter exit, with a fresh
    numbered subdir per call. Per-call mkdtemp with no removal accumulated
    an index copy in /tmp on every gate/CI run (ADVICE r5); the cleanup
    must be deferred because the returned plan reads the persisted files
    lazily — only after the driver collects. Distinct processes (ANSI-on +
    ANSI-off gate matrix) still get distinct roots, and distinct calls get
    distinct subdirs so dynamic partition overwrite can never resurrect a
    previous run's stale bucket partitions."""
    import atexit
    import os
    import shutil
    import tempfile
    if not _BM25_IDX_ROOT:
        root = tempfile.mkdtemp(prefix="trafaret_bm25_idx_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _BM25_IDX_ROOT.append(root)
    sub = os.path.join(_BM25_IDX_ROOT[0], f"run{len(_BM25_IDX_ROOT)}")
    _BM25_IDX_ROOT.append(sub)
    return sub


def q_ret_bm25_idx(spark, sf_dir):
    # THE production retrieval path at 100 TB (retrieval.py module
    # docstring): build the inverted index ONCE, persist it term-bucketed,
    # read it back, and score query batches against the persisted postings
    # — must equal the cold bm25_topk path (same oracle) bit-for-bit.
    import os
    from trafaret_spark import io as ts_io
    docs = _t(spark, sf_dir, "documents")
    n_docs, avgdl = retrieval.corpus_stats(docs)
    post = retrieval.build_postings(docs)
    path = os.path.join(_bm25_idx_dir(),
                        os.path.basename(sf_dir.rstrip("/")))
    ts_io.write_bucketed(post, path, key="term", n_buckets=16)
    post2 = ts_io.read_table(spark, path).drop("bucket")
    qs = spark.createDataFrame(_BM25_QUERIES, ["query_id", "text"])
    out = retrieval.bm25_topk_from_postings(post2, qs, n_docs=n_docs,
                                            avgdl=avgdl, k=5,
                                            max_df_frac=0.79)
    return out.select("query_id", "doc_id",
                      F.col("rank").cast("int").alias("rank"), "score")


def q_cluster_cap(spark, sf_dir):
    # embedding-cluster curation end-state: cluster_assign labels every
    # vector with its nearest centroid (smallest-8-ids codebook — the
    # knn_ivf-style SQL-reproducible default) as a pure scan-side
    # projection, then cap_per_key balances the clusters to their 25
    # smallest ids via the SALTED two-phase path; the oracle is the plain
    # window definition the two-phase plan must equal exactly.
    from trafaret_spark.operators import curation
    emb = _t(spark, sf_dir, "embeddings") \
        .select("vec_id",
                F.col("embedding").cast("array<double>").alias("embedding"))
    assigned = similarity.cluster_assign(emb, n_centroids=8)
    out = curation.cap_per_key(assigned, "cluster_id", n=25,
                               order_by=[F.col("vec_id").asc()],
                               salt_partitions=4, salt_col="vec_id")
    return out.select("vec_id",
                      F.col("cluster_id").cast("int").alias("cluster_id"))


# ---- sem_dedup: composed SemDeDup end-state (r5 verdict #3) ------------
# Shared by q_sem_dedup AND _sem_dedup_oracle (the _BM25_QUERIES pattern).
# Literal centroids (4 unit basis vectors) make cluster structure fully
# controlled, and the planted rows make every stage provably non-vacuous
# on driver data (driver-contract lesson: a green composed row can be
# vacuous — both sides empty still hash-match):
#   * 9000001/9000002/9000003 — colinear with centroid 0 (cosine 1
#     pairwise): an in-cluster near-dup CHAIN; keep_canonical must keep
#     only 9000001.
#   * 9000004 (~e2+0.9·e3, cluster 2) and 9000005 (~0.9·e2+e3,
#     cluster 3) — cosine 0.9945 ≥ θ but assigned to DIFFERENT clusters:
#     the documented SemDeDup recall trade (a dup pair split across two
#     coarse clusters is missed); BOTH must survive.
# θ=0.5 also catches exactly one natural embeddings pair at sf0.01
# (sim ≈ 0.513, probed), so the blocked-pairs stage runs on real data too.
_SEM_DIM = 64
_SEM_THRESHOLD = 0.5
_SEM_CAP = 10_000


def _sem_vec(**pos) -> list:
    return [float(pos.get(f"p{j}", 0.0)) for j in range(_SEM_DIM)]


_SEM_CENTROIDS = [(i, _sem_vec(**{f"p{i}": 1.0})) for i in range(4)]
_SEM_PLANT = [
    (9000001, _sem_vec(p0=1.25)),
    (9000002, _sem_vec(p0=1.5)),
    (9000003, _sem_vec(p0=0.75)),
    (9000004, _sem_vec(p2=1.0, p3=0.9)),
    (9000005, _sem_vec(p2=0.9, p3=1.0)),
]


def q_sem_dedup(spark, sf_dir):
    # composed end-state: cluster_assign (scan-side literal-codebook
    # argmax, attested by cluster_cap) → cosine_neardup with
    # block_cols=[cluster] (attested by dedup_embedding) →
    # keep_canonical's component closure (attested by
    # dedup_keep_canonical), all in ONE value-level oracle — the
    # conv_curate precedent for composed DAGs. on_drop="ignore" keeps the
    # driver query lazy (the warn path's eager count is pytest-covered);
    # no cluster approaches _SEM_CAP at gate scale, mirrored as HAVING.
    emb = _t(spark, sf_dir, "embeddings") \
        .select("vec_id",
                F.col("embedding").cast("array<double>").alias("embedding"))
    plant = spark.createDataFrame(_SEM_PLANT,
                                  "vec_id long, embedding array<double>")
    corpus = emb.unionByName(plant)
    cent = spark.createDataFrame(_SEM_CENTROIDS,
                                 "__cid int, __cv array<double>")
    out = similarity.semantic_dedup(corpus, centroids=cent,
                                    threshold=_SEM_THRESHOLD,
                                    id_col="vec_id",
                                    max_block_size=_SEM_CAP,
                                    on_drop="ignore")
    return out.select("vec_id")


def q_mixture_sample(spark, sf_dir):
    # data-mixture downsample of documents to 50% en / 20% de / 30% zh
    # (binding domain keeps everything); portable hash family so the
    # oracle recomputes membership AND the thresholds bit-for-bit
    docs = _t(spark, sf_dir, "documents")
    out = sampling.mixture_sample(docs, "lang",
                                  {"en": 0.5, "de": 0.2, "zh": 0.3},
                                  key_cols="doc_id", seed=11, portable=True)
    return out.select("doc_id", "lang")


# shared by q_split_assign AND _split_assign_oracle (the _BM25_QUERIES
# pattern): editing either weights or seed in one place keeps the oracle
# structurally coupled instead of coincidentally equal
_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SEED = 5


def q_split_assign(spark, sf_dir):
    # deterministic 80/10/10 train/val/test assignment keyed on doc_id;
    # portable hash family so the oracle recomputes both the hash AND the
    # int-floored cumulative thresholds bit-for-bit
    docs = _t(spark, sf_dir, "documents")
    out = sampling.assign_splits(docs, "doc_id", _SPLIT_WEIGHTS,
                                 seed=_SPLIT_SEED, portable=True)
    return out.select("doc_id", "lang", "split")


def q_time_rollup(spark, sf_dir):
    # decimal sum: exact and independent of partial-agg grouping order
    # (same rationale as f_salted_agg)
    ev = _t(spark, sf_dir, "events") \
        .withColumn("value", F.col("value").cast("decimal(18,6)"))
    out = features.time_rollup(
        ev, ts="ts", every="1 day", by="event_type",
        aggs={"n_events": ("count", "*"), "val_sum": ("sum", "value")})
    return out.select("event_type", "bucket_start", "bucket_end",
                      F.col("n_events").cast("long").alias("n_events"),
                      F.round(F.col("val_sum").cast("double"), 4).alias("val_sum"))


def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = dedup.exact_dedup(docs)
    return out.select("doc_id", "dup_group",
                      F.col("group_size").cast("long").alias("group_size"),
                      "is_canonical")


def q_dedup_minhash(spark, sf_dir):
    # portable=True: md5/mod-M31 hash family (operators/hashing.py) so the
    # DuckDB oracle reproduces signatures, buckets and jaccards bit-for-bit
    out = _minhash_pairs(spark, sf_dir)
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_simhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = dedup.simhash_dedup(docs, portable=True).filter(F.col("hamming") <= 2)
    return out.select("a", "b", F.col("hamming").cast("int").alias("hamming"))


def q_dedup_winnow(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = dedup.winnow_dedup(docs, k=3, w=4, min_shared=2, portable=True)
    return out.select("a", "b", F.col("n_shared").cast("long").alias("n_shared"))


def q_dedup_ngram_jaccard(spark, sf_dir):
    # Finite cap (r2 verdict #3): at sf0.01 this DROPS the hot 'en' block
    # (218 docs > 200) and keeps the rest, so the cap is exercised and the
    # oracle mirrors it; on_drop="ignore" keeps the driver query lazy (the
    # library's default "warn" adds an eager count job for observability).
    docs = _t(spark, sf_dir, "documents")
    out = dedup.ngram_jaccard_pairs(docs, block_cols=["lang"],
                                    threshold=0.9, n=1,
                                    max_block_size=200, on_drop="ignore")
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_embedding(spark, sf_dir):
    # Finite cap: drops labels with > 50 members at sf0.01 (4 of 10 blocks)
    # — the oracle applies the same HAVING filter.
    emb = _t(spark, sf_dir, "embeddings") \
        .select("vec_id", "label",
                F.col("embedding").cast("array<double>").alias("embedding"))
    out = similarity.cosine_neardup(emb, threshold=0.3, block_cols=["label"],
                                    max_block_size=50, on_drop="ignore")
    return out.select("a", "b", F.round("sim", 4).alias("sim"))


def q_dedup_embedding_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings") \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    out = similarity.cosine_neardup(emb, threshold=0.3, nbits=6, bands=8)
    return out.select("a", "b", F.round("sim", 4).alias("sim"))


def q_text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # per-language stopword_ratio keyed on the table's lang column
    # (unknown langs — zh here — fall back to the 'en' marker set)
    out = textstats.quality_features(docs, lang_col="lang")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("digit_ratio", 6).alias("digit_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("dup_line_ratio", 6).alias("dup_line_ratio"),
        F.round("bullet_line_ratio", 6).alias("bullet_line_ratio"))


def q_text_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return textstats.lang_id(docs).select("doc_id", "lang_pred")


def q_text_tokens(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textstats.token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        textstats.bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"))


def q_corpus_report(spark, sf_dir):
    # per-(lang, source) corpus audit: volume, token shape (exact
    # interpolated median — the percentile_cont convention both engines
    # share), degenerate-doc sentinels, mixture share
    docs = _t(spark, sf_dir, "documents")
    out = textstats.corpus_report(docs, by=["lang", "source"])
    return out.select(
        "lang", "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_null_text").cast("long").alias("n_null_text"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        "mean_tokens", "p50_tokens",
        F.col("min_tokens").cast("long").alias("min_tokens"),
        F.col("max_tokens").cast("long").alias("max_tokens"),
        "total_chars", "share")


def q_text_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return textstats.fingerprint(docs, portable=True).select("doc_id", "fingerprint")


def q_text_redact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = textstats.redact_pii(docs)
    return out.select("doc_id", "text",
                      F.col("n_email").cast("long").alias("n_email"),
                      F.col("n_ipv4").cast("long").alias("n_ipv4"),
                      F.col("n_phone").cast("long").alias("n_phone"))


def q_text_sample(spark, sf_dir):
    # portable md5/mod-M31 sampling hash: DuckDB recomputes the exact
    # sample membership (deterministic, nested, scan-side — no shuffle)
    docs = _t(spark, sf_dir, "documents")
    out = sampling.sample_by_hash(docs, "doc_id", rate=0.2, seed=7,
                                  portable=True)
    return out.select("doc_id", "lang")


def q_text_sample_strat(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = sampling.stratified_sample_by_hash(
        docs, "lang", {"en": 0.1, "zh": 0.5}, key_cols="doc_id",
        default_rate=1.0, seed=3, portable=True)
    return out.select("doc_id", "lang")


def q_knn_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings") \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    q = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.cosine_topk(emb, q, k=5)
    return out.select("query_id", "vec_id", F.round("sim", 4).alias("sim"),
                      F.col("rank").cast("int").alias("rank"))


def q_knn_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings") \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    q = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.lsh_cosine_topk(emb, q, k=5, nbits=8, bands=4)
    return out.select("query_id", "vec_id", F.round("sim", 4).alias("sim"),
                      F.col("rank").cast("int").alias("rank"))


def q_knn_ivf(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings") \
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    q = emb.filter(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivf_cosine_topk(emb, q, k=5, n_centroids=8, nprobe=2)
    return out.select("query_id", "vec_id", F.round("sim", 4).alias("sim"),
                      F.col("rank").cast("int").alias("rank"))


def q_emb_pool(spark, sf_dir):
    # group-level embedding pooling (turn/chunk → conversation/document
    # vector): 32 hash groups over the embedding table, SUM pooling so
    # pooled*1e6 is the exact integer component sum (quantize-then-sum
    # makes the value independent of partial-agg order — the attested
    # qsums string is bit-equal in both engines)
    emb = _t(spark, sf_dir, "embeddings")
    g = emb.withColumn("grp", F.pmod(F.col("vec_id"), F.lit(32)))
    out = similarity.pool_embeddings(g, "grp", agg="sum")
    return out.select(
        F.col("grp").cast("long").alias("grp"),
        F.col("n_pooled").cast("long").alias("n_pooled"),
        F.array_join(
            F.transform("pooled",
                        lambda x: F.round(x * 1_000_000)
                        .cast("long").cast("string")), ",").alias("qsums"))


def q_mm_video_frames(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents") \
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    out = multimodal.sample_video_frames(docs, id_col="doc_id", fake=True,
                                         every_ms=1000, fake_duration_ms=5000)
    return out.select("doc_id", "frame_idx", "frame_ts_ms")


def q_mm_image_decode(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents") \
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    out = multimodal.decode_image_features(docs, id_col="doc_id", dim=16, fake=True)
    return out.select("doc_id", "decode_ok",
                      F.size("img_features").alias("feat_dim"))


def q_mm_audio(spark, sf_dir):
    # fake path (no codec in the driver's container) — the sha256-derived
    # values are recomputed bit-for-bit by the DuckDB oracle
    docs = _t(spark, sf_dir, "documents") \
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    out = multimodal.audio_features(docs, id_col="doc_id", fake=True)
    return out.select("doc_id", "duration_ms",
                      F.round("rms", 6).alias("rms"), "n_samples", "decode_ok")


# --------------------------------------------------------------------------
# driver API
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: validate `events` as a transcript-shaped table, as-of join
    the latest prior purchase, add point-in-time window features."""
    sf_dir = "/root/testdata/sf0.001"
    ev = _t(spark, sf_dir, "events")
    schema = ts.Schema(
        ts.Key("event_id", ts.Int(gte=0)),
        ts.Key("user_id", ts.Int(gte=0)),
        ts.Key("event_type", ts.Enum(*(EVENT_TYPES + ["error"]))),
        ts.Key("value", ts.ToFloat()),
        ts.Key("ts", ts.Any()),
        ts.Key("props", ts.String()),
    )
    validated = ts.apply_schema(ev, schema)
    valid, _quarantine = ts.split_valid(validated)
    right = valid.filter(F.col("event_type") == "purchase") \
        .select("user_id", "ts", F.col("value").alias("purchase_value"))
    joined = asof_join(valid, right, on="ts", by="user_id",
                       direction="backward", tolerance=7 * 86400.0)
    out = (features.Features(by="user_id", order="event_id", ts="ts")
           .lag("value", 1)
           .rolling("value", "avg", 5, name="val_avg5")
           .session_id(1800)
           .backfill("purchase_value", name="last_purchase")
           .apply(joined))
    return out


def _attestation_rounds() -> dict[str, int]:
    """Last driver-attested round per query, read from CORRECTNESS_r*.json.

    The driver writes at most 50 correctness rows per round while the registry
    holds 73 queries, so registry order (== driver execution order) decides
    which queries get a fresh hard attestation row.  To keep any query's
    driver row from going stale by more than one round (VERDICT r3 "Next
    round" #1), ``queries()`` sorts the registry stalest-first using the
    per-round artifacts already in the repo root.  Never-attested queries
    sort first of all.
    """
    import json
    import os
    import re

    rounds: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        names = sorted(os.listdir(here))
    except OSError:
        return rounds
    for fn in names:
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(os.path.join(here, fn)) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for qname in data:
            rounds[qname] = max(rounds.get(qname, -1), rnd)
    return rounds


# ---- r7-pending registry entries (SURVEY §7.5 #8-10 families) ----
# Written and DuckDB-validated in round 6 (tests/test_round6.py::
# TestR7PendingIncQueries runs every one against its oracle value-level,
# and each was additionally hand-checked at sf0.01 under ANSI-on) but
# NOT registered in queries()/oracle_sql() yet: the r6 50-row attestation
# window is exactly consumed (sem_dedup + 3 touched + all 46 r4-stale
# rows), so a new tier-0 entry would push an r4 row two rounds stale.
# ROUND 7: move R7_PENDING_QUERIES / R7_PENDING_ORACLES into the registry
# dicts — they enter as tier 0 (never attested).
#
# STALENESS BOUND CHANGES AT REGISTRATION: 97 current + 15 pending = 112
# registered queries vs a 50-row window means two consecutive windows
# cover at most 100 — the r3-r6 invariant "no green row older than one
# round" is arithmetically impossible from round 7 on. The rotation
# (stalest-first, tier-0 first, touched second) keeps the bound tight:
# every query re-attests at least every ceil(112/50) = 3 rounds, and a
# row older than two rounds can only be one the last two windows both
# could not fit (≤ 12 queries per round, always the MOST RECENTLY
# attested ones). State the new bound in round 7's SURVEY delta rather
# than silently missing the old one.

_INC_IDX_ROOT: list = []  # [path] once created; atexit-removed


def _inc_idx_dir() -> str:
    """Process-level temp root for the minhash ingest store (same
    lifecycle contract as :func:`_bm25_idx_dir`: removed at interpreter
    exit, fresh numbered subdir per call so dynamic partition overwrite
    never resurrects a previous run's partitions)."""
    import atexit
    import os
    import shutil
    import tempfile
    if not _INC_IDX_ROOT:
        root = tempfile.mkdtemp(prefix="trafaret_minhash_idx_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _INC_IDX_ROOT.append(root)
    sub = os.path.join(_INC_IDX_ROOT[0], f"run{len(_INC_IDX_ROOT)}")
    _INC_IDX_ROOT.append(sub)
    return sub


def q_dedup_minhash_inc(spark, sf_dir):
    """Incremental near-dup through the PERSISTED band-index store — the
    production ingest loop (dedup.minhash_index_ingest): history
    (doc_id % 4 != 0) is banded and written as batch "0", the new batch
    (doc_id % 4 == 0) is ingested as batch "1" and probed index-only,
    then candidates get the exact-Jaccard verify at pair cardinality.
    Semantics == the full-batch minhash pass restricted to pairs with at
    least one new side (the tested batch-union contract), which is what
    the oracle expresses as a WHERE over the shared _minhash_body CTE."""
    import os
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    path = os.path.join(_inc_idx_dir(),
                        os.path.basename(sf_dir.rstrip("/")))
    # batch-0 ingest writes the store eagerly; its returned (old x old)
    # candidate plan is intentionally unused — no jobs run for it
    dedup.minhash_index_ingest(old, path, "0", portable=True)
    cands = dedup.minhash_index_ingest(new, path, "1", portable=True)
    ver = dedup.jaccard(cands, docs, portable=True)
    return (ver.filter(F.col("jaccard") >= 0.3)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def q_dedup_exact_inc(spark, sf_dir):
    """Exact dedup of the new batch (doc_id % 4 == 0) against the hash
    index of history — dedup.exact_dedup_incremental; == exact_dedup over
    the union restricted to the new rows."""
    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    out = dedup.exact_dedup_incremental(new, dedup.exact_hash_index(old))
    return out.select("doc_id", "dup_group",
                      F.col("group_size").cast("long").alias("group_size"),
                      "is_canonical")


def q_dedup_embedding_inc(spark, sf_dir):
    """Incremental embedding near-dup: the new batch (vec_id % 4 == 0)
    probed against the sign-LSH band index of history
    (similarity.embedding_band_index + embedding_dedup_incremental, the
    same integer-Rademacher banding as the attested dedup_embedding_lsh)
    == cosine_neardup over the union restricted to pairs with a new
    side. History is never re-bucketed; the cosine verify joins vectors
    at pair cardinality."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    old = emb.filter(F.col("vec_id") % 4 != 0)
    new = emb.filter(F.col("vec_id") % 4 == 0)
    idx = similarity.embedding_band_index(old, nbits=6, bands=8, dim=64)
    out = similarity.embedding_dedup_incremental(
        new, idx, old, threshold=0.3, nbits=6, bands=8, dim=64)
    return out.select("a", "b", F.round("sim", 4).alias("sim"))


def q_text_repetition(spark, sf_dir):
    """Gopher repetition rules (textstats.repetition_features): top
    2/3/4-gram and duplicate 5..10-gram character fractions, all
    scan-side folds over sorted gram arrays — the within-document twin
    of the dedup family."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.repetition_features(docs)
    frac_cols = [c for c in out.columns if c.endswith("gram_char_frac")]
    return out.select("doc_id",
                      *[F.round(c, 6).alias(c) for c in frac_cols])


def q_cur_chunk(spark, sf_dir):
    """Stride-overlapped token-window chunking
    (curation.chunk_documents): context-window prep with provenance —
    suffix tail chunks dropped, last chunk always covers the final
    token, blank docs emit nothing."""
    from trafaret_spark.operators import curation
    docs = _t(spark, sf_dir, "documents")
    out = curation.chunk_documents(docs, max_tokens=16, stride=8)
    return out.select("doc_id",
                      F.col("chunk_idx").cast("long").alias("chunk_idx"),
                      F.col("start_tok").cast("long").alias("start_tok"),
                      F.col("n_chunk_tokens").cast("long")
                      .alias("n_chunk_tokens"),
                      "chunk_text")


def q_text_clean_lines(spark, sf_dir):
    """C4 line-level cleaning (textstats.clean_lines) over PLANTED line
    structure: the single-line synthetic docs get deterministic sentence
    breaks (' batch ' / ' data ' → '.\\n'), a 'lorem ipsum.' line at
    doc_id % 97 == 0 and a '{' line at doc_id % 89 == 0, so the keep
    rules, both page flags, and the dropped-line counts are all
    non-vacuous."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.regexp_replace("text", " (batch|data) ", ".\n"),
            F.when(F.col("doc_id") % 97 == 0,
                   F.lit("\nthis is Lorem Ipsum filler text."))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 89 == 0,
                   F.lit("\ncode line with { brace here."))
            .otherwise(F.lit(""))))
    out = textstats.clean_lines(planted, min_words=3)
    return out.select(
        "doc_id", "text_clean",
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
        F.col("n_lines_dropped").cast("long").alias("n_lines_dropped"),
        "has_lorem_ipsum", "has_curly_brace")


def q_text_dup_spans(spark, sf_dir):
    """Exact-substring duplication report (dedup.dup_span_report,
    portable hash family): per-document fraction of tokens covered by
    the union of corpus-duplicated 5-token runs — the Lee et al.
    ExactSubstr signal at report level."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.dup_span_report(docs, k=5, portable=True)
    return out.select("doc_id",
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      "n_grams", "n_dup_grams",
                      "dup_gram_frac", "dup_token_coverage")


def q_lm_dsir(spark, sf_dir):
    """DSIR importance log-weights (lmscore.dsir_logweights): target
    bigram LM trained on the in-domain exemplar slice (lang = 'en'),
    source LM on the raw-corpus sample (doc_id % 5 == 0), every document
    weighted by the exact quantized-integer log-probability difference."""
    docs = _t(spark, sf_dir, "documents")
    target = lmscore.train_bigram_lm(docs.filter(F.col("lang") == "en"))
    source = lmscore.train_bigram_lm(docs.filter(F.col("doc_id") % 5 == 0))
    out = lmscore.dsir_logweights(docs, target, source)
    return out.select("doc_id", "n_bigrams",
                      F.round("logw_bits", 6).alias("logw_bits"))


def q_split_groups(spark, sf_dir):
    """Leakage-safe splits (sampling.assign_splits_by_group): the 80/10/10
    assignment keyed on each document's minhash near-dup COMPONENT, so a
    duplicate family never straddles the train/val/test boundary;
    un-duplicated docs keep their plain split_assign split (same hash,
    same seed — directly comparable to the attested split_assign rows)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = (dedup.minhash_dedup(docs, threshold=0.3, portable=True)
             .select("a", "b"))
    out = sampling.assign_splits_by_group(
        docs, pairs, _SPLIT_WEIGHTS, seed=_SPLIT_SEED, portable=True)
    return out.select("doc_id", "lang", "split")


def q_mm_phash_dedup(spark, sf_dir):
    """Multimodal image dedup plumbing: fake-path pHash (md5-derived
    60-bit, DuckDB-reproducible) over the documents-as-payloads corpus,
    paired through the generic fingerprint band join
    (dedup.fingerprint_neardup, 15-bit bands) at Hamming 0 — exact
    payload duplicates collide, which is what the fake path guarantees.
    The synthetic corpus has no raw-byte duplicate texts, so duplicates
    are PLANTED: every doc_id % 7 == 0 payload re-enters under
    doc_id + 100000 — each planted pair must surface at Hamming 0."""
    base = _t(spark, sf_dir, "documents") \
        .select("doc_id", F.encode("text", "utf-8").alias("payload"))
    clones = base.filter(F.col("doc_id") % 7 == 0) \
        .select((F.col("doc_id") + 100000).alias("doc_id"), "payload")
    fp = multimodal.phash_images(base.unionByName(clones), fake=True)
    out = dedup.fingerprint_neardup(fp, "phash", bits=60, band_bits=15,
                                    max_hamming=0)
    return out.select("a", "b", F.col("hamming").cast("long").alias("hamming"))


def q_dedup_keep_best(spark, sf_dir):
    """Quality-pick dedup end-state (dedup.keep_best): per minhash
    near-dup component the LONGEST document survives (ties -> smallest
    id), instead of keep_canonical's min-id pick."""
    docs = _t(spark, sf_dir, "documents")
    pairs = (dedup.minhash_dedup(docs, threshold=0.3, portable=True)
             .select("a", "b"))
    scored = docs.withColumn("__len", F.length("text"))
    out = dedup.keep_best(scored, pairs, "__len")
    return out.select("doc_id", "lang")


def q_text_vocab(spark, sf_dir):
    """Corpus vocabulary (vocab.build_vocab): deterministic token ids
    ordered by (count desc, token asc) over the normalized token stream,
    long tail cut at min_count=2."""
    from trafaret_spark.operators import vocab
    docs = _t(spark, sf_dir, "documents")
    return vocab.build_vocab(docs, min_count=2).select(
        "token", F.col("count").cast("long").alias("count"), "token_id")


def q_text_encode(spark, sf_dir):
    """Deterministic id encoding (vocab.encode_tokens) against the
    top-64 vocabulary with oov_id=-1; the id sequence is emitted as a
    comma-joined string so the value hash pins order AND content."""
    from trafaret_spark.operators import vocab
    docs = _t(spark, sf_dir, "documents")
    v = vocab.build_vocab(docs).filter(F.col("token_id") < 64)
    out = vocab.encode_tokens(docs, v, oov_id=-1)
    ids = F.array_join(
        F.transform(F.col("token_ids"), lambda x: x.cast("string")), ",")
    return out.select("doc_id", "n_tokens", "n_oov",
                      ids.alias("token_ids_csv"))


def q_text_despanned(spark, sf_dir):
    """ExactSubstr end-state (dedup.remove_dup_spans): documents rebuilt
    with corpus-duplicated 5-token runs removed (every occurrence), raw
    whitespace tokens preserved."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.remove_dup_spans(docs, k=5, portable=True)
    return out.select("doc_id", "text_despanned", "n_tokens",
                      "n_tokens_removed")


def q_conv_render_spans(spark, sf_dir):
    """Loss-mask spans (conversations.render_with_spans): every turn's
    [text_start, text_end) codepoint offsets inside the deterministic
    render, attested by emitting BOTH the offsets and the substring they
    select — the oracle recomputes the offsets by window arithmetic and
    the substring from its own render, so a one-off error anywhere
    breaks the value hash."""
    t = _transcript(spark, sf_dir)
    out = conversations.render_with_spans(t)
    s = F.explode("spans").alias("s")
    ex = out.select("conv_id", "rendered", s)
    return ex.select(
        "conv_id", F.col("s.o").alias("turn_o"), F.col("s.role").alias("role"),
        F.col("s.text_start").alias("text_start"),
        F.col("s.text_end").alias("text_end"),
        F.expr("substring(rendered, s.text_start + 1, "
               "s.text_end - s.text_start)").alias("span_text"))


R7_PENDING_QUERIES = {
    "dedup_exact_inc": q_dedup_exact_inc,
    "dedup_minhash_inc": q_dedup_minhash_inc,
    "dedup_embedding_inc": q_dedup_embedding_inc,
    "text_repetition": q_text_repetition,
    "cur_chunk": q_cur_chunk,
    "text_clean_lines": q_text_clean_lines,
    "text_dup_spans": q_text_dup_spans,
    "lm_dsir": q_lm_dsir,
    "conv_render_spans": q_conv_render_spans,
    "text_despanned": q_text_despanned,
    "text_vocab": q_text_vocab,
    "text_encode": q_text_encode,
    "dedup_keep_best": q_dedup_keep_best,
    "mm_phash_dedup": q_mm_phash_dedup,
    "split_groups": q_split_groups,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = {
        "time_rollup": q_time_rollup,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_components": q_dedup_components,
        "dedup_keep_canonical": q_dedup_keep_canonical,
        "dedup_winnow": q_dedup_winnow,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_embedding": q_dedup_embedding,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "text_tokens": q_text_tokens,
        "text_fingerprint": q_text_fingerprint,
        "text_redact": q_text_redact,
        "text_sample": q_text_sample,
        "text_sample_strat": q_text_sample_strat,
        "knn_cosine": q_knn_cosine,
        "knn_lsh": q_knn_lsh,
        "knn_ivf": q_knn_ivf,
        "mm_video_frames": q_mm_video_frames,
        "mm_image_decode": q_mm_image_decode,
        "mm_audio": q_mm_audio,
        # §2.1 guards
        "v_enum_role": q_v_enum_role,
        "v_string_len": q_v_string_len,
        "v_toint": q_v_toint,
        "v_tofloat_bounds": q_v_tofloat_bounds,
        "v_tobool": q_v_tobool,
        "v_or_null": q_v_or_null,
        "v_todatetime": q_v_todatetime,
        "v_regexp": q_v_regexp,
        "v_key_default": q_v_key_default,
        "v_list": q_v_list,
        "v_tuple": q_v_tuple,
        "v_mapping": q_v_mapping,
        "v_email": q_v_email,
        "v_atom_onerror": q_v_atom_onerror,
        "v_construct": q_v_construct,
        "v_xor_key": q_v_xor_key,
        "v_keyssubset": q_v_keyssubset,
        "v_mongoid": q_v_mongoid,
        "v_bytes": q_v_bytes,
        "v_metrics": q_v_metrics,
        # round-2 coverage: previously pytest-only guards
        "v_types": q_v_types,
        "v_date": q_v_date,
        "v_datetime_any": q_v_datetime_any,
        "v_todecimal": q_v_todecimal,
        "v_bytes_guards": q_v_bytes_guards,
        "v_frombytes": q_v_frombytes,
        "v_url_hex": q_v_url_hex,
        "v_ip": q_v_ip,
        "v_confirm_key": q_v_confirm_key,
        "v_subdict": q_v_subdict,
        "v_dictkeys": q_v_dictkeys,
        "v_forward": q_v_forward,
        "v_call": q_v_call,
        "reshape_unfold": q_reshape_unfold,
        "reshape_fold": q_reshape_fold,
        # E5-E10 features
        "f_lag": q_f_lag,
        "f_rolling": q_f_rolling,
        "f_rolling_time": q_f_rolling_time,
        "f_cum": q_f_cum,
        "f_sessionize": q_f_sessionize,
        "f_backfill": q_f_backfill,
        "f_session_stats": q_f_session_stats,
        "f_salted_agg": q_f_salted_agg,
        # E4 as-of
        "asof_backward": q_asof_backward,
        "asof_forward": q_asof_forward,
        "asof_tolerance": q_asof_tolerance,
        "asof_broadcast": q_asof_broadcast,
        "asof_nearest": q_asof_nearest,
        "asof_strict": q_asof_strict,
        "range_join": q_range_join,
        # round-4 additions
        "range_join_long": q_range_join_long,
        "v_email_idna": q_v_email_idna,
        "cur_decontaminate": q_cur_decontaminate,
        "cur_cap_per_key": q_cur_cap_per_key,
        "cur_pack": q_cur_pack,
        "conv_turn_errors": q_conv_turn_errors,
        "conv_report": q_conv_report,
        "conv_stutter": q_conv_stutter,
        "conv_truncate": q_conv_truncate,
        "conv_render": q_conv_render,
        "conv_dedup": q_conv_dedup,
        "conv_neardup": q_conv_neardup,
        "conv_features": q_conv_features,
        "emb_pool": q_emb_pool,
        "corpus_report": q_corpus_report,
        "conv_curate": q_conv_curate,
        "split_assign": q_split_assign,
        "mixture_sample": q_mixture_sample,
        "ret_bm25": q_ret_bm25,
        "lm_bits": q_lm_bits,
        # round-5 additions
        "ret_bm25_idx": q_ret_bm25_idx,
        "cluster_cap": q_cluster_cap,
        "lm_bucket": q_lm_bucket,
        # round-6 additions
        "sem_dedup": q_sem_dedup,
    }
    # Rotation (r3 verdict "Next round" #1): the driver attests at most 50
    # rows per round, so order the registry (== driver execution order) by
    # attestation need: (0) queries with no driver row ever, (1) queries
    # whose IMPLEMENTATION changed since their newest row (the soft-
    # attestation gap the r3 verdict flagged — update _TOUCHED each round),
    # (2) everything else stalest-first. Ties broken by registry order.
    touched = {
        # round 6 (r5-attested queries whose EXECUTED plan changed):
        # lm_bucket — lm_bucket_by_key's label validation moved from an
        # eager collect to a scan-side assert_true (ADVICE r5, new plan
        # expression); ret_bm25_idx — write_bucketed/read_table's empty-
        # marker handling changed (sidecar _EMPTY_SCHEMA + root-file
        # cleanup, ADVICE r5 medium) inside its executed write/read path;
        # conv_curate — connected_components now pointer-jumps adaptively
        # (jump deferred past round 2 after the always-jump plan measured
        # +13% on the conv DAG) and minhash's jaccard verify semi-joins to
        # candidate ids before shingling (the near-dup stage's closure AND
        # verify plans changed; r5 verdict #4 + round-6 profile). NOT
        # touched: range_join / range_join_long — the new checkpoint_dir
        # param defaults to the attested localCheckpoint path
        # (byte-identical plan); cur_pack / conv_truncate — the counter=
        # params are additive with defaults preserving the attested
        # token_col path. dedup_components / dedup_keep_canonical /
        # conv_neardup also carry the pointer-jump change but are
        # r4-stale, so the standard rotation re-attests them this round
        # anyway (as it does dedup_minhash and ret_bm25, closing the r5
        # exemption the verdict flagged). sem_dedup is NEW (tier 0).
        "lm_bucket", "ret_bm25_idx", "conv_curate",
    }
    pos = {name: i for i, name in enumerate(reg)}
    last = _attestation_rounds()

    def key(n):
        tier = (0 if n not in last else 1 if n in touched else 2)
        return (tier, last.get(n, -1), pos[n])

    return {name: reg[name] for name in sorted(reg, key=key)}


# ---- portable-hash oracle fragments -----------------------------------
# The dedup/fingerprint queries run with portable=True (md5-derived hashes
# mod M31, Rademacher integer LSH planes — see trafaret_spark/operators/
# hashing.py), which DuckDB reproduces exactly. These helpers emit the SQL.

_M31 = (1 << 31) - 1
_NORM_TOKS = (r"string_split_regex(trim(regexp_replace(lower({src}), "
              r"'[^\p{{L}}\p{{N}}]+', ' ', 'g')), '\s+')")


def _sql_tok31(expr: str) -> str:
    return (f"(CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT) "
            f"% {_M31})")


def _sql_hash60(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def _sql_gram31(th: str = "th", n: int = 3) -> str:
    """DuckDB expression: distinct n-gram hashes over token-hash list ``th``
    (mirrors dedup.shingle_hashes portable path: polynomial combine mod M31,
    whole-text fold when shorter than n tokens)."""
    gram = "th[i+1]"
    for j in range(2, n + 1):
        gram = f"(({gram}) * 1000003 + th[i+{j}]) % {_M31}"
    fold = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), {th}), "
            f"(a, b) -> (a * 1000003 + b) % {_M31})")
    return (f"list_distinct(CASE WHEN len({th}) >= {n} THEN "
            f"list_transform(range(len({th}) - {n - 1}), i -> {gram}) "
            f"ELSE [{fold}] END)")


def _minhash_body(table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Shared CTE chain ending at ``v(a, b, i, u)`` — candidate pairs with
    intersection/union sizes, reused by the minhash / connected-components
    oracles (over ``documents``) and the conversation near-dup oracle
    (over the rendered-conversation CTE): ``table``/``id_col``/``text_col``
    select the corpus; the internal ``doc_id`` alias is unchanged."""
    from trafaret_spark.operators.dedup import _coeffs
    coeffs = _coeffs(64, 17)
    a_lit = "([" + ",".join(str(a) for a, _ in coeffs) + "]::BIGINT[])"
    b_lit = "([" + ",".join(str(b) for _, b in coeffs) + "]::BIGINT[])"
    toks = _NORM_TOKS.format(src=text_col)
    return f"""toks AS (
          SELECT {id_col} AS doc_id,
                 list_transform({toks}, t -> {_sql_tok31('t')}) AS th
          FROM {table}),
        grams AS (
          SELECT doc_id, {_sql_gram31('th', 3)} AS g FROM toks),
        sigs AS (
          SELECT doc_id,
                 list_transform(range(64), k ->
                   list_min(list_transform(g, h ->
                     ({a_lit}[k+1] * h + {b_lit}[k+1]) % {_M31}))) AS sig
          FROM grams),
        banded AS (
          SELECT doc_id, b.band,
                 array_to_string(list_slice(sig, b.band*4 + 1, b.band*4 + 4),
                                 ',') AS bucket
          FROM sigs CROSS JOIN (SELECT unnest(range(16)) AS band) b),
        sized AS (
          SELECT band, bucket, list(doc_id) AS ids
          FROM banded GROUP BY band, bucket
          HAVING count(*) > 1 AND count(*) <= 1000),
        pairs AS (
          SELECT DISTINCT p1.a AS a, p2.b AS b
          FROM (SELECT band, bucket, unnest(ids) AS a FROM sized) p1
          JOIN (SELECT band, bucket, unnest(ids) AS b FROM sized) p2
            USING (band, bucket)
          WHERE p1.a < p2.b),
        v AS (
          SELECT p.a, p.b,
                 len(list_intersect(ga.g, gb.g)) AS i,
                 len(ga.g) + len(gb.g) - len(list_intersect(ga.g, gb.g)) AS u
          FROM pairs p
          JOIN grams ga ON ga.doc_id = p.a
          JOIN grams gb ON gb.doc_id = p.b)"""


def _minhash_oracle() -> str:
    return f"""
        WITH {_minhash_body()}
        SELECT a, b, round(i::DOUBLE / u, 6) AS jaccard
        FROM v WHERE i::DOUBLE / u >= 0.3"""


def _closure_sql(threshold: float) -> str:
    """Min-label-closure CTE chain shared by every near-dup end-state
    oracle (components / keep_canonical / conv_neardup / conv_curate):
    filters the minhash ``v(a, b, i, u)`` verification table at
    ``threshold``, builds the undirected edge list, and closes it with a
    recursive reach CTE (UNION set semantics terminate at the fixpoint).
    Exposes ``reach(x, label)`` and ``losers(x)`` — members whose id is
    not their component's minimum. CTE names (vp/ed/reach/losers) avoid
    the _minhash_body namespace so callers can splice both."""
    return f"""vp AS (SELECT a, b FROM v
                  WHERE i::DOUBLE / u >= {threshold}),
        ed AS (SELECT a AS x, b AS y FROM vp
               UNION SELECT b, a FROM vp),
        reach AS (
          SELECT x, x AS label FROM (SELECT DISTINCT x FROM ed)
          UNION
          SELECT ed.x, r.label FROM ed JOIN reach r ON ed.y = r.x),
        losers AS (
          SELECT x FROM reach GROUP BY x HAVING x != min(label))"""


def _components_oracle() -> str:
    """Min-label closure over the verified minhash pairs: component =
    smallest doc id reachable in the undirected pair graph."""
    return f"""
        WITH RECURSIVE {_minhash_body()},
        {_closure_sql(0.3)}
        SELECT x AS node, min(label) AS component
        FROM reach GROUP BY x"""


def _keep_canonical_oracle() -> str:
    """Corpus minus the non-canonical members (node != min-label) of each
    minhash near-dup component."""
    return f"""
        WITH RECURSIVE {_minhash_body()},
        {_closure_sql(0.3)}
        SELECT doc_id, lang FROM documents
        WHERE doc_id NOT IN (SELECT x FROM losers)"""


def _simhash_oracle() -> str:
    toks = _NORM_TOKS.format(src="text")
    h = _sql_hash60("concat(t, '|simhash99')")
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_transform(list_distinct({toks}), t -> {h}) AS th
          FROM documents),
        fps AS (
          SELECT doc_id,
                 list_sum(list_transform(range(32), b ->
                   CASE WHEN list_sum(list_transform(th,
                          h -> ((h >> b) & 1) * 2 - 1)) > 0
                        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS fp
          FROM toks),
        banded AS (
          SELECT doc_id, fp, b.band, (fp >> (b.band * 8)) & 255 AS bucket
          FROM fps CROSS JOIN (SELECT unnest(range(4)) AS band) b),
        pairs AS (
          SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                 l.fp AS fa, r.fp AS fb
          FROM banded l JOIN banded r
            ON l.band = r.band AND l.bucket = r.bucket
           AND l.doc_id < r.doc_id)
        SELECT a, b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
        FROM pairs WHERE bit_count(xor(fa, fb)) <= 2"""


def _fingerprint_oracle() -> str:
    toks = _NORM_TOKS.format(src="text")
    return f"""
        WITH t AS (SELECT doc_id, {toks} AS toks FROM documents)
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(toks, t -> {_sql_tok31('t')})),
                 (acc, h) -> (acc * 1000003 + h) % {_M31}) AS fingerprint
        FROM t"""


def _winnow_oracle(k: int = 3, w: int = 4, min_shared: int = 2,
                   cap: int = 1000) -> str:
    """Winnowing in SQL: positional k-gram hashes (portable family), w-wide
    window minima via list_min over sliding slices, distinct selected set,
    inverted-index pair counting with the same bucket cap as the engine."""
    toks = _NORM_TOKS.format(src="text")
    gram = "th[i+1]"
    for j in range(2, k + 1):
        gram = f"(({gram}) * 1000003 + th[i+{j}]) % {_M31}"
    fold = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), th), "
            f"(a, b) -> (a * 1000003 + b) % {_M31})")
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_transform({toks}, t -> {_sql_tok31('t')}) AS th
          FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(th) >= {k} THEN
                   list_transform(range(len(th) - {k - 1}), i -> {gram})
                 ELSE [{fold}] END AS g
          FROM toks),
        fps AS (
          SELECT doc_id,
                 list_distinct(CASE WHEN len(g) >= {w} THEN
                   list_transform(range(len(g) - {w - 1}),
                                  i -> list_min(list_slice(g, i + 1, i + {w})))
                 ELSE g END) AS fp
          FROM grams),
        inv AS (SELECT doc_id, unnest(fp) AS h FROM fps),
        sized AS (
          SELECT h, list(doc_id) AS ids FROM inv GROUP BY h
          HAVING count(*) > 1 AND count(*) <= {cap}),
        pairs AS (
          SELECT p1.h, p1.a, p2.b
          FROM (SELECT h, unnest(ids) AS a FROM sized) p1
          JOIN (SELECT h, unnest(ids) AS b FROM sized) p2 USING (h)
          WHERE p1.a < p2.b)
        SELECT a, b, count(*) AS n_shared
        FROM pairs GROUP BY a, b HAVING count(*) >= {min_shared}"""


def _lang_id_oracle() -> str:
    """Generated from the library's marker table so the oracle and the
    engine can never drift: per-language hit-rate scores, argmax via
    list_max over (score, lang) structs — DuckDB struct comparison is
    lexicographic by declared field order, exactly Spark's array_max rule
    (ties go to the greater language code)."""
    from trafaret_spark.operators.textstats import _LANG_MARKERS
    scores, structs = [], []
    for lang, words in _LANG_MARKERS.items():
        lst = "(" + ",".join(f"'{w}'" for w in words) + ")"
        scores.append(f"len(list_filter(toks, x -> x IN {lst}))"
                      f" / greatest(len(toks), 1)::DOUBLE AS s_{lang}")
        structs.append(f"{{'score': s_{lang}, 'lang': '{lang}'}}")
    return rf"""
        WITH t AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS toks
          FROM documents),
        s AS (SELECT doc_id, {", ".join(scores)} FROM t),
        b AS (SELECT doc_id, list_max([{", ".join(structs)}]) AS best FROM s)
        SELECT doc_id,
               CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END
                 AS lang_pred
        FROM b"""


def _plane_values_sql(dim: int, nbits: int, bands: int, seed: int) -> str:
    """VALUES rows (pid, pv) for the Rademacher plane matrix — regenerated
    with the exact recipe the Spark kernel uses (hashing.rademacher_planes)."""
    from trafaret_spark.operators.hashing import rademacher_planes
    planes = rademacher_planes(dim, nbits * bands, seed)     # dim × total
    rows = []
    for pid in range(nbits * bands):
        col = ",".join(str(int(x)) for x in planes[:, pid])
        rows.append(f"({pid}, [{col}]::BIGINT[])")
    return ", ".join(rows)


def _lsh_bands_sql(dim: int, nbits: int, bands: int, seed: int,
                   src: str = "embeddings") -> str:
    """CTE prefix computing (vec_id, v DOUBLE[], band, bucket) for sign-LSH
    over ``src`` — mirrors similarity.lsh_band_buckets exactly: fixed-point
    q = floor(x·10^6), integer Rademacher projection, strict >0 sign,
    big-endian bit packing."""
    vals = _plane_values_sql(dim, nbits, bands, seed)
    return f"""
        pl AS (SELECT * FROM (VALUES {vals}) AS t(pid, pv)),
        q AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                     list_transform(embedding::DOUBLE[],
                       x -> CAST(floor(x * 1000000) AS BIGINT)) AS qv
              FROM {src}),
        bits AS (SELECT vec_id, pid,
                        list_sum(list_transform(qv, (x, i) -> x * pv[i])) > 0
                          AS bit
                 FROM q CROSS JOIN pl),
        bands AS (SELECT vec_id, pid // {nbits} AS band,
                         sum(CASE WHEN bit
                             THEN (CAST(1 AS BIGINT) << ({nbits - 1} - (pid % {nbits})))
                             ELSE 0 END) AS bucket
                  FROM bits GROUP BY vec_id, pid // {nbits})"""


_COSINE_SQL = ("list_sum(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]))"
               " / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
               " * sqrt(list_sum(list_transform({b}, x -> x * x))))")


def _embedding_lsh_oracle() -> str:
    sim = _COSINE_SQL.format(a="qa.v", b="qb.v")
    return f"""
        WITH {_lsh_bands_sql(64, 6, 8, 7)},
        cand AS (
          SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
          FROM bands l JOIN bands r
            ON l.band = r.band AND l.bucket = r.bucket
          WHERE l.vec_id < r.vec_id),
        s AS (
          SELECT c.a, c.b, {sim} AS rawsim
          FROM cand c JOIN q qa ON qa.vec_id = c.a
                      JOIN q qb ON qb.vec_id = c.b)
        SELECT a, b, round(rawsim, 4) AS sim FROM s WHERE rawsim >= 0.3"""


def _knn_ivf_oracle() -> str:
    asn = _COSINE_SQL.format(a="e.v", b="c.cv")
    sim = _COSINE_SQL.format(a="eq.v", b="ec.v")
    return f"""
        WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding::DOUBLE[] AS cv
                   FROM embeddings ORDER BY vec_id LIMIT 8),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        ca AS (SELECT vec_id, cid FROM (
                 SELECT e.vec_id, c.cid,
                        row_number() OVER (PARTITION BY e.vec_id
                                           ORDER BY {asn} DESC, c.cid) AS rn
                 FROM e CROSS JOIN c) WHERE rn = 1),
        qa AS (SELECT vec_id AS query_id, cid FROM (
                 SELECT e.vec_id, c.cid,
                        row_number() OVER (PARTITION BY e.vec_id
                                           ORDER BY {asn} DESC, c.cid) AS rn
                 FROM e CROSS JOIN c WHERE e.vec_id < 5) WHERE rn <= 2),
        cand AS (SELECT DISTINCT qa.query_id, ca.vec_id
                 FROM qa JOIN ca USING (cid)),
        scored AS (SELECT cand.query_id, cand.vec_id, {sim} AS rawsim
                   FROM cand JOIN e eq ON eq.vec_id = cand.query_id
                             JOIN e ec ON ec.vec_id = cand.vec_id),
        ranked AS (SELECT query_id, vec_id, round(rawsim, 4) AS sim,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY rawsim DESC, vec_id) AS rank
                   FROM scored)
        SELECT query_id, vec_id, sim, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 5"""


def _knn_lsh_oracle() -> str:
    sim = _COSINE_SQL.format(a="qq.v", b="qc.v")
    return f"""
        WITH {_lsh_bands_sql(64, 8, 4, 7)},
        cand AS (
          SELECT DISTINCT ql.vec_id AS query_id, c.vec_id AS vec_id
          FROM bands ql JOIN bands c
            ON ql.band = c.band AND ql.bucket = c.bucket
          WHERE ql.vec_id < 5),
        scored AS (
          SELECT cand.query_id, cand.vec_id, {sim} AS rawsim
          FROM cand JOIN q qq ON qq.vec_id = cand.query_id
                    JOIN q qc ON qc.vec_id = cand.vec_id),
        ranked AS (
          SELECT query_id, vec_id, round(rawsim, 4) AS sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY rawsim DESC, vec_id) AS rank
          FROM scored)
        SELECT query_id, vec_id, sim, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 5"""


_EV_LIST = "('click', 'view', 'signup', 'purchase')"
_TRUE_LIST = "('t','true','y','yes','on','1','1.0')"
_FALSE_LIST = "('false','n','no','off','0','none','0.0')"
_EN_STOP = "('the','of','and','to','a','in','is','that','for','it')"


def _stop_case_sql(lang_col: str) -> str:
    """DuckDB CASE expression yielding the per-language marker-stopword
    list (mirrors quality_features(lang_col=...): unknown langs → 'en')."""
    from trafaret_spark.operators.textstats import _LANG_MARKERS

    def lst(lang):
        return "[" + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang]) + "]"

    whens = " ".join(f"WHEN '{l}' THEN {lst(l)}" for l in _LANG_MARKERS)
    return f"(CASE {lang_col} {whens} ELSE {lst('en')} END)"


def _split_groups_oracle() -> str:
    """Mirror q_split_groups: min-label closure over the verified minhash
    pairs, group key = coalesce(component, doc_id), then the exact
    assign_splits hash CASE (same seed/weights/threshold ints as the
    attested split_assign oracle) over the GROUP key string."""
    weights = _SPLIT_WEIGHTS
    names = list(weights)
    key = (f"concat_ws(chr(31), '{_SPLIT_SEED}', "
           f"coalesce(CAST(grp AS VARCHAR), chr(30)))")
    h = _sql_tok31(key)
    cum, whens = 0.0, []
    for name in names[:-1]:
        cum += weights[name]
        whens.append(f"WHEN {h} < {int(cum * _M31)} THEN '{name}'")
    return f"""
        WITH RECURSIVE {_minhash_body()},
        {_closure_sql(0.3)},
        comp AS (SELECT x AS node, min(label) AS component
                 FROM reach GROUP BY x),
        keyed AS (
          SELECT d.doc_id, d.lang,
                 coalesce(c.component, d.doc_id) AS grp
          FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
        SELECT doc_id, lang,
               CASE {' '.join(whens)} ELSE '{names[-1]}' END AS split
        FROM keyed"""


def _split_assign_oracle() -> str:
    """Mirror q_split_assign: replicate assign_splits' threshold loop
    (cum += w in float64, int(cum * M31)) so the emitted literals are the
    engine's exact ints — no SQL float arithmetic to diverge."""
    weights = _SPLIT_WEIGHTS
    names = list(weights)
    h = _sample_hash_sql(_SPLIT_SEED)
    cum, whens = 0.0, []
    for name in names[:-1]:
        cum += weights[name]
        whens.append(f"WHEN {h} < {int(cum * _M31)} THEN '{name}'")
    return f"""
        SELECT doc_id, lang,
               CASE {' '.join(whens)} ELSE '{names[-1]}' END AS split
        FROM documents"""


def _sample_hash_sql(seed: int) -> str:
    """DuckDB expression for sampling.sample_hash(['doc_id'], seed,
    portable=True): tok31 of concat_ws(chr(31), seed, coalesced doc_id)
    — NULL key values encode as chr(30), matching the engine's
    _NULL_MARK so membership is identical even on nullable keys."""
    key = (f"concat_ws(chr(31), '{seed}', "
           f"coalesce(CAST(doc_id AS VARCHAR), chr(30)))")
    return _sql_tok31(key)


# Shared CTEs for the conversation-operator oracles: the same transcript
# derivation as _transcript() (dense turn_idx over event_id, mixed
# legal/illegal roles), plus the per-turn lag frame turn_errors uses.
_TRANSCRIPT_CTE = """
    t0 AS (
      SELECT CAST(user_id AS VARCHAR) AS conv_id,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id)
                  - 1 AS BIGINT) AS turn_idx,
             event_type, props AS text, ts, event_id
      FROM events),
    tr AS (
      SELECT conv_id, turn_idx,
             CASE WHEN event_type = 'error' THEN 'tool'
                  WHEN turn_idx = 0 THEN 'system'
                  WHEN turn_idx % 2 = 1 THEN 'user'
                  ELSE 'assistant' END AS role,
             text,
             CASE WHEN event_type = 'error' THEN ts - INTERVAL 1 HOUR
                  ELSE ts END AS ts,
             event_id
      FROM t0 WHERE event_id % 53 <> 0)"""

_TURN_LAG_CTE = """
    lg AS (
      SELECT conv_id, turn_idx, role, text, ts,
             row_number() OVER w AS rn,
             lag(turn_idx) OVER w AS p_turn,
             lag(role) OVER w AS p_role,
             lag(ts) OVER w AS p_ts
      FROM tr
      WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx NULLS FIRST))"""

# Fired codes joined by ',' in the engine's check order (null_order,
# turn_gap, null_role, bad_start_role, bad_transition, ts_regress) —
# concat_ws skips the NULL (unfired) slots in both engines. "First turn"
# is rn = 1 (NOT "lag IS NULL", which a NULL ordering key on the previous
# row would fake); NULL ordering keys sort FIRST, matching the engine's
# explicit asc_nulls_first. The transition list is
# sorted(conversations.DEFAULT_TRANSITIONS).
_TURN_ERRS_SQL = """concat_ws(',',
  CASE WHEN turn_idx IS NULL THEN 'null_order' END,
  CASE WHEN (rn = 1 AND turn_idx <> 0)
         OR (rn > 1 AND turn_idx <> p_turn + 1)
       THEN 'turn_gap' END,
  CASE WHEN role IS NULL THEN 'null_role' END,
  CASE WHEN rn = 1 AND role IS NOT NULL
         AND role NOT IN ('system', 'user') THEN 'bad_start_role' END,
  CASE WHEN rn > 1 AND role IS NOT NULL AND p_role IS NOT NULL
         AND NOT ((p_role = 'assistant' AND role = 'tool')
               OR (p_role = 'assistant' AND role = 'user')
               OR (p_role = 'system' AND role = 'user')
               OR (p_role = 'tool' AND role = 'assistant')
               OR (p_role = 'tool' AND role = 'tool')
               OR (p_role = 'user' AND role = 'assistant'))
       THEN 'bad_transition' END,
  CASE WHEN ts IS NOT NULL AND p_ts IS NOT NULL AND ts < p_ts
       THEN 'ts_regress' END)"""


_TOKS_SQL = (r"CASE WHEN text IS NULL "
             r"OR trim(regexp_replace(lower(text), "
             r"'[^\p{L}\p{N}]+', ' ', 'g')) = '' THEN []::VARCHAR[] "
             r"ELSE string_split_regex(trim(regexp_replace(lower(text), "
             r"'[^\p{L}\p{N}]+', ' ', 'g')), '\s+') END")


def _bm25_oracle(k: int = 5, k1: float = 1.2, b: float = 0.75,
                 max_df_frac: float = 0.79) -> str:
    """Mirror retrieval.bm25_topk bit-for-bit: float literals are emitted
    via repr() of the SAME Python-computed doubles the engine embeds
    (k1+1, 1-b), per-term contributions quantized to micro-units before
    the sum, so scores are exact integers in both engines."""
    vals = ", ".join(f"({qid}, '{t}')" for qid, t in _BM25_QUERIES)
    return f"""
        WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
        s0 AS (SELECT count(*) AS n, CAST(sum(len(tk)) AS BIGINT) AS sdl
               FROM toks),
        post AS (
          SELECT t.doc_id, len(tk) AS dl, u.w AS term, count(*) AS tf
          FROM toks t, unnest(tk) AS u(w)
          GROUP BY t.doc_id, len(tk), u.w),
        kept AS (
          SELECT term, count(*) AS df FROM post GROUP BY term
          HAVING count(*) <= {max_df_frac!r} * (SELECT n FROM s0)),
        q(query_id, qtext) AS (VALUES {vals}),
        qt AS (SELECT DISTINCT query_id, u.w AS term
               FROM (SELECT query_id,
                            {_TOKS_SQL.replace('text', 'qtext')} AS tk
                     FROM q) x, unnest(tk) AS u(w)),
        contrib AS (
          SELECT qt.query_id, p.doc_id,
                 CAST(floor(
                   ln(1.0 + (CAST(s0.n AS DOUBLE) - df + 0.5) / (df + 0.5))
                   * ((CAST(tf AS DOUBLE) * {k1 + 1.0!r})
                      / (CAST(tf AS DOUBLE)
                         + {k1!r} * ({1.0 - b!r}
                                     + {b!r} * (CAST(dl AS DOUBLE)
                                                / (s0.sdl / s0.n)))))
                   * 1000000) AS BIGINT) AS cq
          FROM post p JOIN kept USING (term) JOIN qt USING (term)
          CROSS JOIN s0),
        sq AS (SELECT query_id, doc_id, CAST(sum(cq) AS BIGINT) AS s
               FROM contrib GROUP BY query_id, doc_id),
        ranked AS (SELECT query_id, doc_id, s,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY s DESC, doc_id) AS rank
                   FROM sq)
        SELECT query_id, doc_id, CAST(rank AS INT) AS rank,
               s / 1000000.0 AS score
        FROM ranked WHERE rank <= {k}"""


def _lm_bits_oracle(alpha: float = 0.5) -> str:
    """Mirror lmscore.train_bigram_lm + lm_score: train slice doc_id%5=0,
    add-α smoothing with V = |vocab|+1, per-bigram log-probs quantized
    before the per-doc sum. α·V is computed inside SQL with the same
    double multiply the engine does in Python."""
    ln2 = __import__("math").log(2.0)
    return f"""
        WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
        tb AS (SELECT doc_id, tk FROM toks WHERE doc_id % 5 = 0),
        tpairs AS (
          SELECT p.w1, p.w2 FROM (
            SELECT unnest(list_transform(range(greatest(len(tk) - 1, 0)),
                     i -> {{'w1': tk[i + 1], 'w2': tk[i + 2]}})) AS p
            FROM tb) x),
        c2 AS (SELECT w1, w2, count(*) AS c2 FROM tpairs GROUP BY w1, w2),
        c1 AS (SELECT w1, count(*) AS c1 FROM tpairs GROUP BY w1),
        v AS (SELECT count(DISTINCT u.w) + 1 AS vs
              FROM tb, unnest(tk) AS u(w)),
        sc AS (SELECT doc_id, tk FROM toks WHERE doc_id % 5 <> 0),
        spairs AS (
          SELECT doc_id, p.w1, p.w2 FROM (
            SELECT doc_id,
                   unnest(list_transform(range(greatest(len(tk) - 1, 0)),
                     i -> {{'w1': tk[i + 1], 'w2': tk[i + 2]}})) AS p
            FROM sc) x),
        lq AS (
          SELECT s.doc_id,
                 CAST(floor(ln((coalesce(c2.c2, 0) + {alpha!r})
                               / (coalesce(c1.c1, 0) + {alpha!r} * v.vs))
                            * 1000000) AS BIGINT) AS q
          FROM spairs s
          LEFT JOIN c2 ON s.w1 = c2.w1 AND s.w2 = c2.w2
          LEFT JOIN c1 ON s.w1 = c1.w1
          CROSS JOIN v),
        agg AS (SELECT doc_id, count(*) AS n, CAST(sum(q) AS BIGINT) AS s
                FROM lq GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
               -(agg.s / agg.n) / 1000000.0 / {ln2!r} AS bits_per_token
        FROM (SELECT DISTINCT doc_id FROM sc) b
        LEFT JOIN agg USING (doc_id)"""


def _lm_bucket_oracle() -> str:
    """lm_bits oracle wrapped in (a) the shared-edge global CASE and
    (b) the per-domain tercile recipe: quantile_cont reproduces Spark's
    exact F.percentile interpolation bit-for-bit (same double inputs,
    same q literals, same linear-interpolation formula — probed per-lang
    on driver data), so `bits >= edges[i]` buckets identically."""
    e0, e1 = _LM_EDGES
    l0, l1, l2 = _LM_LABELS
    q0, q1 = _LM_Q
    return f"""
        WITH s AS ({_lm_bits_oracle()}),
        sl AS (SELECT s.doc_id, d.lang, s.bits_per_token
               FROM s JOIN documents d USING (doc_id)),
        e AS (SELECT lang,
                     quantile_cont(bits_per_token, [{q0!r}, {q1!r}]) AS edges
              FROM sl WHERE bits_per_token IS NOT NULL GROUP BY lang)
        SELECT sl.doc_id, sl.lang, sl.bits_per_token,
               CASE WHEN sl.bits_per_token IS NULL THEN NULL
                    WHEN sl.bits_per_token < {e0!r} THEN '{l0}'
                    WHEN sl.bits_per_token < {e1!r} THEN '{l1}'
                    ELSE '{l2}' END AS lm_bucket,
               CASE WHEN sl.bits_per_token IS NULL OR e.edges IS NULL
                    THEN NULL
                    ELSE (['{l0}', '{l1}', '{l2}'])[
                      1 + CAST(sl.bits_per_token >= e.edges[1] AS INT)
                        + CAST(sl.bits_per_token >= e.edges[2] AS INT)]
               END AS lm_bucket_dom
        FROM sl LEFT JOIN e USING (lang)"""


def _cluster_cap_oracle() -> str:
    """Mirror q_cluster_cap: the knn_ivf-style nearest-centroid argmax
    (smallest-8-ids codebook) followed by the PLAIN per-cluster window
    the salted two-phase cap_per_key must equal exactly."""
    asn = _COSINE_SQL.format(a="e.v", b="c.cv")
    return f"""
        WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding::DOUBLE[] AS cv
                   FROM embeddings ORDER BY vec_id LIMIT 8),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        ca AS (SELECT vec_id, cid AS cluster_id FROM (
                 SELECT e.vec_id, c.cid,
                        row_number() OVER (PARTITION BY e.vec_id
                                           ORDER BY {asn} DESC, c.cid) AS rn
                 FROM e CROSS JOIN c) WHERE rn = 1)
        SELECT vec_id, CAST(cluster_id AS INT) AS cluster_id FROM ca
        QUALIFY row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY vec_id) <= 25"""


def _sem_dedup_oracle() -> str:
    """Mirror q_sem_dedup end-to-end: literal-centroid argmax (the
    cluster_cap-attested tiebreak: sim DESC — NaN greatest, NULLs last —
    then cid), capped within-cluster exact-cosine pairs ≥ θ
    (dedup_embedding's attested arithmetic: DuckDB's sequential list_sum
    reproduces Spark's aggregate-fold doubles bit-for-bit), then the
    min-label recursive closure and anti-join (_closure_sql's shape)."""
    def arr(vec):
        return "[" + ", ".join(repr(x) for x in vec) + "]::DOUBLE[]"
    cent_rows = ", ".join(f"({cid}, {arr(cv)})"
                          for cid, cv in _SEM_CENTROIDS)
    plant_rows = ", ".join(f"({vid}, {arr(v)})" for vid, v in _SEM_PLANT)
    asn = _COSINE_SQL.format(a="e.v", b="c.cv")
    sim = _COSINE_SQL.format(a="l.v", b="r.v")
    return f"""
        WITH RECURSIVE
        cent(cid, cv) AS (VALUES {cent_rows}),
        plant(vec_id, v) AS (VALUES {plant_rows}),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              UNION ALL SELECT vec_id, v FROM plant),
        ca AS (SELECT vec_id, v, cid AS cl FROM (
                 SELECT e.vec_id, e.v, c.cid,
                        row_number() OVER (PARTITION BY e.vec_id
                                           ORDER BY {asn} DESC, c.cid) AS rn
                 FROM e CROSS JOIN cent c) WHERE rn = 1),
        keep AS (SELECT cl FROM ca GROUP BY cl
                 HAVING count(*) <= {_SEM_CAP}),
        vp AS (SELECT a, b FROM (
                 SELECT l.vec_id AS a, r.vec_id AS b, {sim} AS rawsim
                 FROM ca l JOIN ca r ON l.cl = r.cl AND l.vec_id < r.vec_id
                 JOIN keep ON keep.cl = l.cl)
               WHERE rawsim >= {_SEM_THRESHOLD}),
        ed AS (SELECT a AS x, b AS y FROM vp
               UNION SELECT b, a FROM vp),
        reach AS (
          SELECT x, x AS label FROM (SELECT DISTINCT x FROM ed)
          UNION
          SELECT ed.x, r.label FROM ed JOIN reach r ON ed.y = r.x),
        losers AS (
          SELECT x FROM reach GROUP BY x HAVING x != min(label))
        SELECT vec_id FROM e
        WHERE vec_id NOT IN (SELECT x FROM losers)"""


def _sample_oracle(rate: float, seed: int) -> str:
    thr = int(rate * _M31)
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE {_sample_hash_sql(seed)} < {thr}"""


def _sample_strat_oracle() -> str:
    te, tz = int(0.1 * _M31), int(0.5 * _M31)
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE {_sample_hash_sql(3)} < CASE lang WHEN 'en' THEN {te}
                                                WHEN 'zh' THEN {tz}
                                                ELSE {_M31} END"""


def _text_redact_oracle() -> str:
    from trafaret_spark.operators.textstats import PII_PATTERNS
    red = "text"
    for kind in sorted(PII_PATTERNS):
        red = f"regexp_replace({red}, '{PII_PATTERNS[kind]}', '[REDACTED]', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{PII_PATTERNS[k]}')) AS BIGINT) "
        f"AS n_{k}" for k in ("email", "ipv4", "phone"))
    return f"""
        SELECT doc_id, {red} AS text, {counts}
        FROM documents"""


def _text_repetition_oracle(top_ns=(2, 3, 4),
                            dup_ns=(5, 6, 7, 8, 9, 10)) -> str:
    """Generated per-n CTEs mirroring textstats.repetition_features
    exactly: same token normalization, gram join, every-occurrence
    duplicate mass, and (count, mass)-lexicographic top tie-break
    (DuckDB struct max compares fields in declared order, which IS the
    engine's fold rule)."""
    ctes, selects, joins = [], [], []
    for n in sorted(set(top_ns) | set(dup_ns)):
        ctes.append(f"""
        g{n} AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, len(toks) - {n} + 1),
                   i -> array_to_string(toks[i:i + {n} - 1], ' '))) AS gram
          FROM t),
        a{n} AS (
          SELECT doc_id,
                 (max(struct_pack(c := cnt, m := cnt * glen))).m AS topm,
                 coalesce(sum(CASE WHEN cnt >= 2 THEN cnt * glen END), 0)
                   AS dupm
          FROM (SELECT doc_id, count(*) AS cnt, length(gram) AS glen
                FROM g{n} GROUP BY doc_id, gram)
          GROUP BY doc_id)""")
        joins.append(f"LEFT JOIN a{n} USING (doc_id)")
    for n in top_ns:
        selects.append(f"round(coalesce(a{n}.topm / t.nc, 0), 6) "
                       f"AS top_{n}gram_char_frac")
    for n in dup_ns:
        selects.append(f"round(coalesce(a{n}.dupm / t.nc, 0), 6) "
                       f"AS dup_{n}gram_char_frac")
    return f"""
        WITH t AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\\s+') AS toks,
                 greatest(length(text), 1)::DOUBLE AS nc
          FROM documents),{",".join(ctes)}
        SELECT t.doc_id, {", ".join(selects)}
        FROM t {" ".join(joins)}"""


def _dsir_oracle(alpha: float = 0.5) -> str:
    """Mirror lmscore.dsir_logweights over q_lm_dsir's model recipe:
    target trained on lang='en', source on doc_id%5=0, per-bigram
    quantized log-prob DIFFERENCE (each model floor-quantized separately,
    exactly the engine's integer arithmetic) summed per document."""
    ln2 = __import__("math").log(2.0)
    pairs = ("unnest(list_transform(range(greatest(len(tk) - 1, 0)), "
             "i -> {'w1': tk[i + 1], 'w2': tk[i + 2]}))")
    return f"""
        WITH toks AS (SELECT doc_id, lang, {_TOKS_SQL} AS tk
                      FROM documents),
        tt AS (SELECT tk FROM toks WHERE lang = 'en'),
        tp AS (SELECT p.w1, p.w2 FROM (SELECT {pairs} AS p FROM tt) x),
        c2t AS (SELECT w1, w2, count(*) AS c2 FROM tp GROUP BY w1, w2),
        c1t AS (SELECT w1, count(*) AS c1 FROM tp GROUP BY w1),
        vt AS (SELECT count(DISTINCT u.w) + 1 AS vs
               FROM tt, unnest(tk) AS u(w)),
        ts AS (SELECT tk FROM toks WHERE doc_id % 5 = 0),
        sp AS (SELECT p.w1, p.w2 FROM (SELECT {pairs} AS p FROM ts) x),
        c2s AS (SELECT w1, w2, count(*) AS c2 FROM sp GROUP BY w1, w2),
        c1s AS (SELECT w1, count(*) AS c1 FROM sp GROUP BY w1),
        vs_ AS (SELECT count(DISTINCT u.w) + 1 AS vs
                FROM ts, unnest(tk) AS u(w)),
        dpairs AS (
          SELECT doc_id, p.w1, p.w2 FROM (
            SELECT doc_id, {pairs} AS p FROM toks) x),
        lq AS (
          SELECT d.doc_id,
                 CAST(floor(ln((coalesce(c2t.c2, 0) + {alpha!r})
                               / (coalesce(c1t.c1, 0) + {alpha!r} * vt.vs))
                            * 1000000) AS BIGINT)
                 - CAST(floor(ln((coalesce(c2s.c2, 0) + {alpha!r})
                               / (coalesce(c1s.c1, 0) + {alpha!r} * vs_.vs))
                              * 1000000) AS BIGINT) AS dq
          FROM dpairs d
          LEFT JOIN c2t ON d.w1 = c2t.w1 AND d.w2 = c2t.w2
          LEFT JOIN c1t ON d.w1 = c1t.w1
          LEFT JOIN c2s ON d.w1 = c2s.w1 AND d.w2 = c2s.w2
          LEFT JOIN c1s ON d.w1 = c1s.w1
          CROSS JOIN vt CROSS JOIN vs_),
        agg AS (SELECT doc_id, count(*) AS n, CAST(sum(dq) AS BIGINT) AS s
                FROM lq GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
               round((agg.s / 1000000.0) / {ln2!r}, 6) AS logw_bits
        FROM (SELECT DISTINCT doc_id FROM documents) b
        LEFT JOIN agg USING (doc_id)"""


def _despanned_oracle(k: int = 5, min_count: int = 2) -> str:
    """Mirror dedup.remove_dup_spans: RAW whitespace tokens (no
    normalize_text — case/punct-sensitive tok31), corpus-wide duplicated
    k-gram positions, token i removed iff some duplicated gram starts in
    [i-k+1, i] (the span-membership identity the engine's exists() uses),
    rebuild by string_agg over kept tokens in order."""
    gram = "th[i+1]"
    for j in range(2, k + 1):
        gram = f"(({gram}) * 1000003 + th[i+{j}]) % {_M31}"
    fold = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), th), "
            f"(a, b) -> (a * 1000003 + b) % {_M31})")
    return f"""
        WITH raw AS (
          SELECT doc_id,
                 CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\\s+')
                 END AS toks
          FROM documents),
        toksh AS (
          SELECT doc_id, toks,
                 list_transform(toks, t -> {_sql_tok31('t')}) AS th
          FROM raw),
        pg AS (
          SELECT doc_id, toks,
                 CASE WHEN len(th) = 0 THEN CAST([] AS BIGINT[])
                      WHEN len(th) >= {k} THEN
                   list_transform(range(len(th) - {k - 1}), i -> {gram})
                 ELSE [{fold}] END AS pgs
          FROM toksh),
        e AS (
          SELECT doc_id, unnest(pgs) AS gram,
                 generate_subscripts(pgs, 1) - 1 AS pos
          FROM pg),
        f AS (SELECT gram FROM e GROUP BY gram
              HAVING count(*) >= {min_count}),
        dp AS (SELECT e.doc_id, e.pos FROM e JOIN f USING (gram)),
        tok AS (
          SELECT doc_id, unnest(toks) AS tk,
                 generate_subscripts(toks, 1) - 1 AS i
          FROM pg),
        kept AS (
          SELECT t.doc_id, t.tk, t.i FROM tok t
          WHERE NOT EXISTS (
            SELECT 1 FROM dp WHERE dp.doc_id = t.doc_id
              AND dp.pos BETWEEN t.i - {k - 1} AND t.i)),
        reb AS (
          SELECT doc_id, string_agg(tk, ' ' ORDER BY i) AS text_despanned,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id)
        SELECT pg.doc_id,
               coalesce(reb.text_despanned, '') AS text_despanned,
               CAST(len(pg.toks) AS BIGINT) AS n_tokens,
               CAST(len(pg.toks) - coalesce(reb.n_kept, 0) AS BIGINT)
                 AS n_tokens_removed
        FROM pg LEFT JOIN reb USING (doc_id)"""


def _dup_spans_oracle(k: int = 5, min_count: int = 2) -> str:
    """Mirrors dedup.dup_span_report (portable family): positional
    k-gram hashes, corpus-wide frequency cut, span-union coverage via a
    per-doc window — spans all have length k, so the previous position's
    capped end is the running coverage frontier (lag(pos)+k-1), exactly
    the engine's sorted-position fold."""
    toks = _NORM_TOKS.format(src="text")
    gram = "th[i+1]"
    for j in range(2, k + 1):
        gram = f"(({gram}) * 1000003 + th[i+{j}]) % {_M31}"
    fold = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), th), "
            f"(a, b) -> (a * 1000003 + b) % {_M31})")
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 list_transform({toks}, t -> {_sql_tok31('t')}) AS th
          FROM documents),
        pg AS (
          SELECT doc_id, len(th) AS n_tokens,
                 CASE WHEN len(th) >= {k} THEN
                   list_transform(range(len(th) - {k - 1}), i -> {gram})
                 ELSE [{fold}] END AS pgs
          FROM toks),
        e AS (
          SELECT doc_id, n_tokens, unnest(pgs) AS gram,
                 generate_subscripts(pgs, 1) - 1 AS pos
          FROM pg),
        f AS (SELECT gram FROM e GROUP BY gram
              HAVING count(*) >= {min_count}),
        fl AS (SELECT e.*, f.gram IS NOT NULL AS isdup
               FROM e LEFT JOIN f USING (gram)),
        d AS (
          SELECT doc_id, any_value(n_tokens) AS n_tokens,
                 count(*) AS n_grams,
                 count(*) FILTER (isdup) AS n_dup_grams
          FROM fl GROUP BY doc_id),
        lg AS (
          SELECT doc_id, pos, n_tokens,
                 lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS lp
          FROM fl WHERE isdup),
        c AS (
          -- DuckDB least/greatest IGNORE NULLs (Spark's propagate), so
          -- the no-previous-span case needs an explicit branch
          SELECT doc_id,
                 CASE WHEN lp IS NULL THEN pos
                      ELSE greatest(least(lp + {k} - 1, n_tokens - 1) + 1,
                                    pos) END AS s,
                 least(pos + {k} - 1, n_tokens - 1) AS e
          FROM lg),
        cov AS (
          SELECT doc_id,
                 sum(CASE WHEN e >= s THEN e - s + 1 ELSE 0 END) AS covered
          FROM c GROUP BY doc_id)
        SELECT d.doc_id, d.n_tokens, d.n_grams, d.n_dup_grams,
               round(d.n_dup_grams / greatest(d.n_grams, 1)::DOUBLE, 9)
                 AS dup_gram_frac,
               round(coalesce(cov.covered, 0)
                     / greatest(d.n_tokens, 1)::DOUBLE, 9)
                 AS dup_token_coverage
        FROM d LEFT JOIN cov USING (doc_id)"""


def _clean_lines_oracle(min_words: int = 3) -> str:
    """Mirrors q_text_clean_lines: same planted line structure, keep
    rules generated from textstats.TERMINAL_PUNCT_CLASS so the engine
    and oracle share one punctuation contract."""
    from trafaret_spark.operators.textstats import TERMINAL_PUNCT_CLASS
    cls = TERMINAL_PUNCT_CLASS.replace("'", "''")
    keep = (f"x -> trim(x) != '' "
            f"AND len(string_split_regex(trim(x), '\\s+')) >= {min_words} "
            f"AND regexp_matches(trim(x), '[{cls}]$')")
    return f"""
        WITH m AS (
          SELECT doc_id,
                 regexp_replace(text, ' (batch|data) ', '.' || chr(10), 'g')
                 || CASE WHEN doc_id % 97 = 0
                         THEN chr(10) || 'this is Lorem Ipsum filler text.'
                         ELSE '' END
                 || CASE WHEN doc_id % 89 = 0
                         THEN chr(10) || 'code line with {{ brace here.'
                         ELSE '' END AS text
          FROM documents),
        l AS (
          SELECT doc_id, text, string_split(text, chr(10)) AS lines,
                 list_filter(string_split(text, chr(10)), {keep}) AS kept
          FROM m)
        SELECT doc_id,
               -- DuckDB folds the empty-list join to NULL; the engine's
               -- array_join gives '' — match the engine
               coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
               len(kept) AS n_lines_kept,
               len(lines) - len(kept) AS n_lines_dropped,
               contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
               contains(text, '{{') AS has_curly_brace
        FROM l"""


def r7_pending_oracles() -> dict[str, str]:
    """Oracles for R7_PENDING_QUERIES (see the comment block there): the
    incremental operators equal the batch pass over (history ∪ batch)
    restricted to the new side — so each oracle is the already-attested
    batch oracle plus that WHERE restriction."""
    return {
        "dedup_exact_inc": r"""
            WITH k AS (
              SELECT doc_id,
                     md5(trim(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g')))
                       AS dup_group
              FROM documents),
            g AS (
              SELECT dup_group, count(*) AS group_size, min(doc_id) AS canon
              FROM k GROUP BY dup_group)
            SELECT k.doc_id, k.dup_group, g.group_size,
                   k.doc_id = g.canon AS is_canonical
            FROM k JOIN g USING (dup_group)
            WHERE k.doc_id % 4 = 0""",
        "dedup_minhash_inc": f"""
            WITH {_minhash_body()}
            SELECT a, b, round(i::DOUBLE / u, 6) AS jaccard
            FROM v WHERE i::DOUBLE / u >= 0.3
              AND (a % 4 = 0 OR b % 4 = 0)""",
        "text_repetition": _text_repetition_oracle(),
        "text_clean_lines": _clean_lines_oracle(),
        "text_dup_spans": _dup_spans_oracle(),
        "lm_dsir": _dsir_oracle(),
        "text_despanned": _despanned_oracle(),
        "split_groups": _split_groups_oracle(),
        "mm_phash_dedup": f"""
            WITH u AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents
              WHERE doc_id % 7 = 0),
            fp AS (
              SELECT doc_id, {_sql_hash60('text')} AS phash
              FROM u),
            banded AS (
              SELECT doc_id, phash, b.band,
                     (phash >> (b.band * 15)) & 32767 AS bucket
              FROM fp CROSS JOIN (SELECT unnest(range(4)) AS band) b),
            pairs AS (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                     l.phash AS fa, r.phash AS fb
              FROM banded l JOIN banded r
                ON l.band = r.band AND l.bucket = r.bucket
               AND l.doc_id < r.doc_id)
            SELECT a, b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
            FROM pairs WHERE bit_count(xor(fa, fb)) = 0""",
        "dedup_keep_best": f"""
            WITH RECURSIVE {_minhash_body()},
            {_closure_sql(0.3)},
            comp AS (SELECT x AS node, min(label) AS component
                     FROM reach GROUP BY x),
            ranked AS (
              SELECT c.node,
                     row_number() OVER (
                       PARTITION BY c.component
                       ORDER BY length(d.text) DESC, c.node) AS rn
              FROM comp c JOIN documents d ON d.doc_id = c.node)
            SELECT doc_id, lang FROM documents
            WHERE doc_id NOT IN (SELECT node FROM ranked WHERE rn > 1)""",
        "text_vocab": f"""
            WITH t AS (SELECT {_TOKS_SQL} AS tk FROM documents),
            c AS (SELECT u.w AS token, count(*) AS count
                  FROM t, unnest(tk) AS u(w)
                  GROUP BY u.w HAVING count(*) >= 2)
            SELECT token, CAST(count AS BIGINT) AS count,
                   CAST(row_number() OVER (ORDER BY count DESC, token) - 1
                        AS BIGINT) AS token_id
            FROM c""",
        "text_encode": f"""
            WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
            c AS (SELECT u.w AS token, count(*) AS count
                  FROM t, unnest(tk) AS u(w) GROUP BY u.w),
            v AS (SELECT token,
                         row_number() OVER (ORDER BY count DESC, token) - 1
                           AS token_id
                  FROM c QUALIFY token_id < 64),
            e AS (SELECT doc_id, unnest(tk) AS token,
                         generate_subscripts(tk, 1) AS pos
                  FROM t),
            j AS (SELECT e.doc_id, e.pos,
                         coalesce(v.token_id, -1) AS tid,
                         v.token_id IS NULL AS oov
                  FROM e LEFT JOIN v USING (token)),
            a AS (SELECT doc_id, count(*) AS n_tokens,
                         sum(CASE WHEN oov THEN 1 ELSE 0 END) AS n_oov,
                         string_agg(tid, ',' ORDER BY pos) AS ids
                  FROM j GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
                   coalesce(a.ids, '') AS token_ids_csv
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN a USING (doc_id)""",
        "conv_render_spans": f"""
            WITH {_TRANSCRIPT_CTE},
            seg AS (
              SELECT conv_id, turn_idx,
                     coalesce(role, '') AS role,
                     coalesce(text, '') AS text,
                     2 + length(coalesce(role, '')) + 2 AS header_len,
                     length(coalesce(text, '')) AS text_len
              FROM tr),
            pos AS (
              SELECT conv_id, turn_idx, role, header_len, text_len,
                     coalesce(sum(header_len + text_len + 1) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS prefix
              FROM seg),
            r AS (
              SELECT conv_id,
                     string_agg('<|' || role || '|>' || text,
                                chr(10) ORDER BY turn_idx) AS rendered
              FROM seg GROUP BY conv_id)
            SELECT p.conv_id, p.turn_idx AS turn_o, p.role,
                   CAST(p.prefix + p.header_len AS BIGINT) AS text_start,
                   CAST(p.prefix + p.header_len + p.text_len AS BIGINT)
                     AS text_end,
                   substring(r.rendered,
                             CAST(p.prefix + p.header_len + 1 AS BIGINT),
                             CAST(p.text_len AS BIGINT)) AS span_text
            FROM pos p JOIN r USING (conv_id)""",
        "cur_chunk": r"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                          ELSE string_split_regex(trim(text), '\s+')
                     END AS toks
              FROM documents),
            s AS (
              SELECT doc_id, toks, len(toks) AS n,
                     unnest(list_filter(
                       generate_series(1, len(toks), 8),
                       s -> s = 1 OR s - 8 + 16 - 1 < len(toks))) AS st
              FROM t WHERE len(toks) > 0)
            SELECT doc_id,
                   (st - 1) // 8 AS chunk_idx,
                   st AS start_tok,
                   least(16, n - st + 1) AS n_chunk_tokens,
                   array_to_string(toks[st:st + 16 - 1], ' ') AS chunk_text
            FROM s""",
        "dedup_embedding_inc": f"""
            WITH {_lsh_bands_sql(64, 6, 8, 7)},
            cand AS (
              SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
              FROM bands l JOIN bands r
                ON l.band = r.band AND l.bucket = r.bucket
              WHERE l.vec_id < r.vec_id
                AND (l.vec_id % 4 = 0 OR r.vec_id % 4 = 0)),
            s AS (
              SELECT c.a, c.b,
                     {_COSINE_SQL.format(a="qa.v", b="qb.v")} AS rawsim
              FROM cand c JOIN q qa ON qa.vec_id = c.a
                          JOIN q qb ON qb.vec_id = c.b)
            SELECT a, b, round(rawsim, 4) AS sim FROM s
            WHERE rawsim >= 0.3""",
    }


def oracle_sql() -> dict[str, str]:
    return {
        "v_enum_role": f"""
            SELECT event_id,
                   CASE WHEN event_type IN {_EV_LIST}
                        THEN event_type END AS event_type,
                   event_type IN {_EV_LIST} AS valid,
                   CASE WHEN event_type IN {_EV_LIST} THEN NULL
                        ELSE 'does_not_match_any' END AS err_code
            FROM events""",
        "v_string_len": """
            SELECT doc_id,
                   CASE WHEN length(text) < 50 THEN 'short_string'
                        WHEN length(text) > 300 THEN 'long_string' END AS err_code
            FROM documents""",
        "v_toint": r"""
            WITH raw AS (
              SELECT event_id,
                     CASE WHEN event_id % 13 = 0
                            THEN regexp_extract(props, '"k": (\d+)', 1) || '.5'
                          WHEN event_id % 17 = 0
                            THEN 'x' || regexp_extract(props, '"k": (\d+)', 1)
                          ELSE regexp_extract(props, '"k": (\d+)', 1) END AS k_raw
              FROM events)
            SELECT event_id,
                   CASE WHEN event_id % 13 = 0 OR event_id % 17 = 0 THEN NULL
                        ELSE CAST(k_raw AS BIGINT) END AS k_int,
                   CASE WHEN event_id % 13 = 0 OR event_id % 17 = 0
                        THEN 'is_not_a_number' END AS err_code
            FROM raw""",
        "v_tofloat_bounds": """
            SELECT event_id,
                   CASE WHEN value >= 5.0 AND value <= 95.0
                        THEN round(value, 6) END AS val,
                   CASE WHEN value < 5.0 THEN 'too_small'
                        WHEN value > 95.0 THEN 'too_big' END AS err_code
            FROM events""",
        "v_tobool": f"""
            WITH raw AS (
              SELECT event_id,
                     ['true','0','YES','off','none','bogus'][(event_id % 6 + 1)::INT] AS raw
              FROM events)
            SELECT event_id, raw,
                   CASE WHEN lower(raw) IN {_TRUE_LIST} THEN TRUE
                        WHEN lower(raw) IN {_FALSE_LIST} THEN FALSE END AS b,
                   CASE WHEN lower(raw) NOT IN {_TRUE_LIST}
                         AND lower(raw) NOT IN {_FALSE_LIST}
                        THEN 'is_not_convertible_to_bool' END AS err_code
            FROM raw""",
        "v_or_null": """
            WITH raw AS (
              SELECT event_id,
                     CASE WHEN event_id % 11 = 0 THEN NULL
                          WHEN event_id % 11 = 1 THEN 'hammer'
                          ELSE ['search','code','browse'][(event_id % 3 + 1)::INT]
                     END AS tool
              FROM events)
            SELECT event_id, tool,
                   CASE WHEN tool IN ('search','code','browse') THEN tool
                   END AS tool_checked,
                   (tool IS NULL OR tool IN ('search','code','browse')) AS valid,
                   CASE WHEN tool IS NOT NULL
                         AND tool NOT IN ('search','code','browse')
                        THEN 'nothing_match' END AS err_code
            FROM raw""",
        "v_todatetime": """
            SELECT event_id,
                   CASE WHEN event_id % 19 = 0 THEN NULL
                        ELSE date_trunc('second', ts) END AS ts_parsed,
                   CASE WHEN event_id % 19 = 0
                        THEN 'does_not_match_format' END AS err_code
            FROM events""",
        "v_regexp": r"""
            SELECT doc_id, regexp_extract(source, '^src(\d+)', 0) AS src_num,
                   CAST(NULL AS VARCHAR) AS err_code
            FROM documents""",
        "v_key_default": """
            SELECT event_id, 'web' AS channel FROM events""",
        "v_list": """
            WITH g AS (SELECT event_id, event_id % 5 + 1 AS n FROM events)
            SELECT event_id,
                   CASE WHEN n <= 3 THEN n END AS n_xs,
                   CASE WHEN n > 4 THEN 'too_long'
                        WHEN n = 4 THEN 'some_elements_did_not_match'
                   END AS err_code
            FROM g""",
        "v_tuple": """
            SELECT event_id,
                   CASE WHEN event_type IN ('click','view','signup','purchase')
                        THEN user_id END AS uid,
                   CASE WHEN event_type IN ('click','view','signup','purchase')
                        THEN event_type END AS etype,
                   CASE WHEN event_type NOT IN ('click','view','signup','purchase')
                        THEN 'some_elements_did_not_match' END AS err_code
            FROM events""",
        "v_mapping": """
            SELECT event_id,
                   CASE WHEN value <= 100.0 THEN event_type END AS mkey,
                   CASE WHEN value > 100.0 THEN 'mapping_failed' END AS err_code
            FROM events""",
        "v_email": """
            SELECT event_id,
                   CASE WHEN event_id % 7 = 0 THEN NULL
                        ELSE 'user' || event_id || '@example.com' END AS addr,
                   CASE WHEN event_id % 7 = 0
                        THEN 'is_not_valid_email' END AS err_code
            FROM events""",
        "v_atom_onerror": """
            SELECT event_id,
                   CASE WHEN event_id % 4 = 0 THEN NULL ELSE 'web' END AS chan,
                   CASE WHEN event_id % 4 = 0 THEN 'bad_channel' END AS err_code
            FROM events""",
        "v_construct": """
            SELECT event_id, round(value, 6) AS value, event_type,
                   CAST(NULL AS VARCHAR) AS err_code
            FROM events""",
        "v_xor_key": """
            SELECT event_id,
                   CASE WHEN event_id % 6 = 0 THEN NULL
                        WHEN event_id % 3 = 0 THEN round(value, 6)
                        WHEN event_id % 2 = 0 THEN round(value * 2, 6)
                   END AS ab,
                   CASE WHEN event_id % 6 = 0 THEN 'only_one_must_be_defined'
                        WHEN event_id % 3 != 0 AND event_id % 2 != 0
                        THEN 'one_is_required' END AS err_code
            FROM events""",
        "v_keyssubset": """
            SELECT event_id, 'u' || user_id || ' ' || 'x' || event_id AS name
            FROM events""",
        "v_mongoid": """
            SELECT event_id,
                   CASE WHEN event_id % 13 = 0 THEN NULL
                        ELSE substr(md5(event_id::VARCHAR), 1, 24) END AS oid,
                   CASE WHEN event_id % 13 = 0
                        THEN 'invalid_objectid' END AS err_code
            FROM events""",
        "v_bytes": """
            SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                   CAST(NULL AS VARCHAR) AS err_code
            FROM documents""",
        "v_types": """
            SELECT event_id,
                   CASE WHEN event_id % 5 != 0 THEN event_id % 2 = 0 END AS flag,
                   CASE WHEN event_id % 5 = 0 THEN 'required' END AS err_code
            FROM events""",
        "v_date": """
            SELECT event_id,
                   CASE WHEN event_id % 23 = 0 THEN NULL
                        ELSE strftime(CAST(ts AS DATE), '%Y-%m-%d') END AS d,
                   CASE WHEN event_id % 23 = 0
                        THEN 'does_not_match_format' END AS err_code
            FROM events""",
        "v_datetime_any": """
            SELECT event_id,
                   CASE WHEN event_id % 4 = 3 THEN NULL
                        WHEN event_id % 4 = 1
                          THEN CAST(CAST(ts AS DATE) AS TIMESTAMP)
                        ELSE date_trunc('second', ts) END AS ts_any,
                   CASE WHEN event_id % 4 = 3 THEN 'not_datetime' END AS err_code
            FROM events""",
        "v_todecimal": """
            WITH raw AS (
              SELECT event_id,
                     CAST(concat(event_id % 1000, '.',
                                 lpad(CAST(event_id % 97 AS VARCHAR), 2, '0'))
                          AS DECIMAL(38,18)) AS num
              FROM events)
            SELECT event_id,
                   CASE WHEN event_id % 9 = 0 OR num < 1.0 THEN NULL
                        ELSE round(CAST(num AS DOUBLE), 6) END AS d,
                   CASE WHEN event_id % 9 = 0 THEN 'invalid_decimal'
                        WHEN num < 1.0 THEN 'too_small' END AS err_code
            FROM raw""",
        "v_bytes_guards": """
            WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n
                       FROM documents)
            SELECT doc_id,
                   CASE WHEN n >= 50 AND n <= 300 THEN n END AS n_bytes,
                   CASE WHEN n = 0 THEN 'empty_string'
                        WHEN n < 50 THEN 'short_string'
                        WHEN n > 300 THEN 'long_string' END AS err_code
            FROM b""",
        "v_frombytes": """
            SELECT doc_id, text AS text2, CAST(NULL AS VARCHAR) AS err_code
            FROM documents""",
        "v_url_hex": """
            SELECT event_id,
                   CASE WHEN event_id % 7 = 0 THEN NULL
                        ELSE 'https://example.com/p/' || event_id END AS url,
                   CASE WHEN event_id % 11 = 0 THEN NULL
                        ELSE substr(md5(event_id::VARCHAR), 1, 16) END AS hx,
                   concat_ws(',',
                     CASE WHEN event_id % 7 = 0 THEN 'is_not_valid_url' END,
                     CASE WHEN event_id % 11 = 0 THEN 'does_not_match_re' END)
                     AS err_codes
            FROM events""",
        "v_ip": """
            SELECT event_id,
                   CASE WHEN event_id % 300 <= 255
                        THEN '10.0.0.' || (event_id % 300) END AS ip4,
                   concat_ws(',',
                     CASE WHEN event_id % 300 > 255 THEN 'is_not_ipv4' END,
                     CASE WHEN event_id % 3 != 0 AND event_id % 300 > 255
                          THEN 'is_not_ip' END) AS err_codes
            FROM events""",
        "v_confirm_key": """
            SELECT event_id,
                   CASE WHEN event_id % 13 = 0 OR event_id % 6 = 0 THEN NULL
                        ELSE 'p' || event_id END AS pw,
                   CASE WHEN event_id % 13 = 0 THEN 'required'
                        WHEN event_id % 6 = 0 THEN 'must_be_equal'
                   END AS err_code
            FROM events""",
        "v_subdict": """
            SELECT event_id,
                   CASE WHEN length('x' || event_id) <= 4
                        THEN 'u' || user_id || ' ' || 'x' || event_id
                   END AS full,
                   CASE WHEN length('x' || event_id) > 4
                        THEN 'long_string' END AS err_code
            FROM events""",
        "v_dictkeys": """
            SELECT event_id, 'required' AS err_code FROM events""",
        "v_forward": """
            SELECT event_id,
                   CASE WHEN event_id % 5 != 0 AND event_id % 7 != 0
                        THEN 'node' || event_id END AS name,
                   CASE WHEN event_id % 5 = 0 OR event_id % 7 = 0
                        THEN 'some_elements_did_not_match' END AS err_code
            FROM events""",
        "v_call": """
            SELECT event_id,
                   CASE WHEN event_id % 10 = 0 THEN NULL
                        ELSE upper(event_type) END AS up,
                   CASE WHEN event_id % 10 = 0 THEN 'call_failed' END AS err_code
            FROM events""",
        "reshape_fold": """
            SELECT doc_id, lang AS lang2, source AS source2 FROM documents""",
        "v_metrics": f"""
            WITH e AS (
              SELECT CASE WHEN event_type NOT IN {_EV_LIST}
                          THEN 'does_not_match_any' END AS etype_err,
                     CASE WHEN value < 5.0 THEN 'too_small' END AS val_err
              FROM events)
            SELECT * FROM (
              SELECT 'event_type' AS path, etype_err AS code,
                     count(*) AS n_rows
              FROM e WHERE etype_err IS NOT NULL GROUP BY etype_err
              UNION ALL
              SELECT 'value' AS path, val_err AS code, count(*) AS n_rows
              FROM e WHERE val_err IS NOT NULL GROUP BY val_err
              UNION ALL
              SELECT '' AS path, '_total_' AS code, count(*) AS n_rows FROM e
              UNION ALL
              SELECT '' AS path, '_valid_' AS code, count(*) AS n_rows
              FROM e WHERE etype_err IS NULL AND val_err IS NULL)""",
        "reshape_unfold": """
            SELECT doc_id, lang AS meta__lang, source AS meta__source
            FROM documents""",
        "f_lag": """
            SELECT event_id, user_id,
                   lag(value, 1) OVER w AS value_lag1,
                   lag(event_type, 2) OVER w AS etype_lag2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""",
        "f_rolling": """
            SELECT event_id,
                   round(avg(value) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS val_avg3,
                   round(max(value) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS val_max5
            FROM events""",
        "f_rolling_time": """
            SELECT event_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 3600 SECONDS PRECEDING
                               AND CURRENT ROW), 6) AS val_sum1h
            FROM events""",
        "f_cum": """
            SELECT event_id,
                   round(sum(value) OVER w, 6) AS val_cumsum,
                   count(value) OVER w AS n_seen
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
        "f_sessionize": """
            WITH g AS (
              SELECT event_id, user_id,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY event_id)
                            > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
              FROM events)
            SELECT event_id, user_id,
                   CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS session_id
            FROM g""",
        "f_backfill": """
            SELECT event_id,
                   round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                         IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                     AS last_purchase
            FROM events""",
        "f_session_stats": """
            WITH g AS (
              SELECT *, CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                          (PARTITION BY user_id ORDER BY event_id)
                          > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
              FROM events),
            s AS (
              SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS session_id
              FROM g)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_turns,
                   min(ts) AS session_start, max(ts) AS session_end,
                   epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
            FROM s GROUP BY user_id, session_id""",
        "f_salted_agg": """
            WITH d AS (SELECT user_id, event_id,
                              CAST(value AS DECIMAL(18,6)) AS v FROM events)
            SELECT user_id, count(event_id) AS n_events,
                   round(CAST(sum(v) AS DOUBLE), 4) AS val_sum,
                   round(CAST(max(v) AS DOUBLE), 6) AS val_max,
                   round(CAST(sum(v) AS DOUBLE) / count(event_id), 4) AS val_avg
            FROM d GROUP BY user_id""",
        "asof_backward": """
            SELECT l.event_id, round(r.value, 6) AS value_r
            FROM (SELECT * FROM events WHERE event_type = 'view') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "asof_forward": """
            SELECT l.event_id, round(r.value, 6) AS value_r
            FROM (SELECT * FROM events WHERE event_type = 'view') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts <= r.ts""",
        "asof_tolerance": """
            SELECT l.event_id,
                   CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= 1800 * 1000000
                        THEN round(r.value, 6) END AS value_r
            FROM (SELECT * FROM events WHERE event_type = 'view') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "asof_broadcast": """
            SELECT l.event_id, round(r.value, 6) AS value_r
            FROM (SELECT * FROM events WHERE event_type = 'view') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "asof_nearest": """
            WITH l AS (SELECT * FROM events WHERE event_type = 'view'),
            r AS (SELECT user_id, ts, value FROM events
                  WHERE event_type = 'purchase'),
            b AS (SELECT l.event_id, l.ts AS lts, r.ts AS bts, r.value AS bval
                  FROM l ASOF LEFT JOIN r
                    ON l.user_id = r.user_id AND l.ts >= r.ts),
            f AS (SELECT l.event_id, r.ts AS fts, r.value AS fval
                  FROM l ASOF LEFT JOIN r
                    ON l.user_id = r.user_id AND l.ts <= r.ts)
            SELECT b.event_id,
                   round(CASE
                     WHEN bts IS NULL THEN fval
                     WHEN fts IS NULL THEN bval
                     WHEN epoch_us(fts) - epoch_us(lts)
                          < epoch_us(lts) - epoch_us(bts) THEN fval
                     ELSE bval END, 6) AS value_r
            FROM b JOIN f USING (event_id)""",
        "asof_strict": """
            WITH r AS (SELECT user_id, ts, value FROM events
                       WHERE event_type = 'purchase'),
            ranked AS (
              SELECT l.event_id, r.value,
                     row_number() OVER (PARTITION BY l.event_id
                                        ORDER BY r.ts DESC) AS rn
              FROM (SELECT * FROM events WHERE event_type = 'view') l
              JOIN r ON l.user_id = r.user_id AND r.ts < l.ts)
            SELECT l.event_id, round(ranked.value, 6) AS value_r
            FROM (SELECT * FROM events WHERE event_type = 'view') l
            LEFT JOIN ranked ON ranked.event_id = l.event_id AND ranked.rn = 1""",
        "dedup_components": _components_oracle(),
        "dedup_keep_canonical": _keep_canonical_oracle(),
        "dedup_winnow": _winnow_oracle(),
        "range_join": """
            SELECT l.event_id, round(r.value, 6) AS value_r
            FROM (SELECT * FROM events WHERE event_type = 'view') l
            JOIN (SELECT user_id, ts - INTERVAL 30 MINUTE AS s,
                         ts + INTERVAL 30 MINUTE AS e, value
                  FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.s AND l.ts <= r.e""",
        "range_join_long": """
            WITH l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'view'),
            r AS (
              SELECT user_id, ts - INTERVAL 30 MINUTE AS s,
                     ts + INTERVAL 30 MINUTE AS e, value
              FROM events WHERE event_type = 'purchase'
              UNION ALL
              SELECT user_id, min(ts) AS s,
                     min(ts) + INTERVAL 3650 DAY AS e, -1.0 AS value
              FROM events WHERE event_type = 'signup' GROUP BY user_id)
            SELECT l.event_id, count(*) AS n_matches,
                   round(sum(r.value), 6) AS val_sum
            FROM l JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.s AND l.ts <= r.e
            GROUP BY l.event_id""",
        "v_email_idna": """
            SELECT event_id,
                   CASE WHEN event_id % 5 = 0
                          THEN 'ivan@xn--e1afmkfd.xn--p1ai'
                        WHEN event_id % 5 = 1 THEN NULL
                        ELSE 'user' || event_id || '@example.com' END AS addr,
                   CASE WHEN event_id % 5 = 1
                        THEN 'is_not_valid_email' END AS err_code
            FROM events""",
        "cur_decontaminate": f"""
            WITH t AS (
              SELECT doc_id,
                     list_transform({_NORM_TOKS.format(src='text')},
                                    t -> {_sql_tok31('t')}) AS th
              FROM documents),
            g AS (SELECT doc_id, {_sql_gram31('th', 3)} AS grams FROM t),
            bench AS (SELECT list_distinct(flatten(list(grams))) AS bg
                      FROM g WHERE doc_id % 7 = 0),
            c AS (SELECT doc_id, grams FROM g WHERE doc_id % 7 <> 0)
            SELECT c.doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
                   CAST(len(list_intersect(grams, bg)) AS BIGINT) AS n_hits,
                   round(len(list_intersect(grams, bg))::DOUBLE
                         / greatest(len(grams), 1), 6) AS overlap_frac,
                   len(list_intersect(grams, bg)) >= 2 AS contaminated
            FROM c CROSS JOIN bench""",
        "cur_cap_per_key": """
            SELECT event_id, user_id, event_type
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id DESC) <= 3""",
        "cur_pack": r"""
            WITH t AS (
              SELECT doc_id, doc_id % 4 AS shard,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                     END AS n_tokens
              FROM documents),
            c AS (
              SELECT doc_id, shard, n_tokens,
                     coalesce(SUM(n_tokens) OVER (
                        PARTITION BY shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cb
              FROM t)
            SELECT doc_id, shard,
                   CAST(cb // 512 AS BIGINT) AS pack_id,
                   CAST(cb % 512 AS BIGINT) AS offset,
                   CAST(CASE WHEN n_tokens > 0
                             THEN (cb + n_tokens - 1) // 512
                                  - cb // 512 + 1
                             ELSE 1 END AS BIGINT) AS n_chunks
            FROM c""",
        "time_rollup": """
            WITH d AS (SELECT event_type, ts,
                              CAST(value AS DECIMAL(18,6)) AS v FROM events)
            SELECT event_type,
                   date_trunc('day', ts) AS bucket_start,
                   date_trunc('day', ts) + INTERVAL 1 DAY AS bucket_end,
                   count(*) AS n_events,
                   round(CAST(sum(v) AS DOUBLE), 4) AS val_sum
            FROM d GROUP BY event_type, date_trunc('day', ts)""",
        "dedup_exact": r"""
            WITH k AS (
              SELECT doc_id,
                     md5(trim(regexp_replace(lower(text), '[^\p{L}\p{N}]+', ' ', 'g')))
                       AS dup_group
              FROM documents),
            g AS (
              SELECT dup_group, count(*) AS group_size, min(doc_id) AS canon
              FROM k GROUP BY dup_group)
            SELECT k.doc_id, k.dup_group, g.group_size,
                   k.doc_id = g.canon AS is_canonical
            FROM k JOIN g USING (dup_group)""",
        "dedup_ngram_jaccard": r"""
            WITH t AS (
              SELECT doc_id, lang,
                     list_distinct(string_split_regex(trim(regexp_replace(
                       lower(text), '[^\p{L}\p{N}]+', ' ', 'g')), '\s+')) AS toks
              FROM documents),
            keep AS (
              SELECT lang FROM t GROUP BY lang HAVING count(*) <= 200),
            p AS (
              SELECT l.doc_id AS a, r.doc_id AS b,
                     len(list_intersect(l.toks, r.toks)) AS i,
                     len(l.toks) + len(r.toks)
                       - len(list_intersect(l.toks, r.toks)) AS u
              FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
              JOIN keep ON keep.lang = l.lang)
            SELECT a, b, round(i::DOUBLE / u, 6) AS jaccard
            FROM p WHERE i::DOUBLE / u >= 0.9""",
        "dedup_embedding": """
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings),
            keep AS (
              SELECT label FROM e GROUP BY label HAVING count(*) <= 50),
            p AS (
              SELECT l.vec_id AS a, r.vec_id AS b,
                     list_sum(list_transform(list_zip(l.v, r.v),
                              x -> x[1] * x[2]))
                     / (sqrt(list_sum(list_transform(l.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(r.v, x -> x * x))))
                       AS rawsim
              FROM e l JOIN e r ON l.label = r.label AND l.vec_id < r.vec_id
              JOIN keep ON keep.label = l.label)
            SELECT a, b, round(rawsim, 4) AS sim
            FROM p WHERE rawsim >= 0.3""",
        "text_quality": rf"""
            WITH t AS (
              SELECT doc_id, text, lang,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
                     string_split_regex(trim(lower(text)), '\s+') AS toks,
                     length(text) AS n_chars,
                     list_filter(string_split(text, chr(10)),
                                 l -> trim(l) != '') AS lines
              FROM documents)
            SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
                   round(greatest(n_chars, 1)::DOUBLE / greatest(n_tok, 1), 6)
                     AS avg_token_len,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         / greatest(n_chars, 1)::DOUBLE, 6) AS alpha_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         / greatest(n_chars, 1)::DOUBLE, 6) AS digit_ratio,
                   round(len(list_filter(toks,
                           x -> list_contains({_stop_case_sql('lang')}, x)))
                         / greatest(n_tok, 1)::DOUBLE, 6) AS stopword_ratio,
                   round(1.0 - len(list_distinct(list_transform(lines,
                           l -> trim(l)))) / greatest(len(lines), 1)::DOUBLE,
                         6) AS dup_line_ratio,
                   round(len(list_filter(lines,
                           l -> regexp_matches(ltrim(l), '^[-*•]')))
                         / greatest(len(lines), 1)::DOUBLE, 6)
                     AS bullet_line_ratio
            FROM t""",
        "text_lang_id": _lang_id_oracle(),
        "text_tokens": r"""
            WITH p AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws,
                     regexp_extract_all(text,
                       '([A-Za-z]+|[0-9]|[^A-Za-z0-9\s]|\s+)', 1) AS pieces
              FROM documents)
            SELECT doc_id, CAST(n_ws AS BIGINT) AS n_ws_tokens,
                   CAST(coalesce(list_sum(list_transform(pieces,
                        x -> CASE WHEN trim(x) = '' THEN 0
                                  ELSE greatest(1, CAST(floor(length(x) / 4) AS INT))
                             END)), 0) AS BIGINT) AS n_bpe_tokens
            FROM p""",
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, c.vec_id,
                     list_sum(list_transform(list_zip(q.qe, c.embedding::DOUBLE[]),
                              x -> x[1] * x[2]))
                     / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
                        * sqrt(list_sum(list_transform(c.embedding::DOUBLE[],
                                                       x -> x * x)))) AS rawsim
              FROM q CROSS JOIN embeddings c),
            ranked AS (
              SELECT query_id, vec_id, round(rawsim, 4) AS sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY rawsim DESC, vec_id) AS rank
              FROM scored)
            SELECT query_id, vec_id, sim, CAST(rank AS INT) AS rank
            FROM ranked WHERE rank <= 5""",
        "mm_video_frames": """
            SELECT doc_id, CAST(t.range AS INT) AS frame_idx,
                   CAST(t.range * 1000 AS BIGINT) AS frame_ts_ms
            FROM documents CROSS JOIN range(5) t""",
        # hash-defined queries: portable=True hash family (md5 mod M31,
        # Rademacher integer LSH planes) is reproduced exactly in SQL —
        # see the _*_oracle() builders above
        "dedup_minhash": _minhash_oracle(),
        "dedup_simhash": _simhash_oracle(),
        "text_fingerprint": _fingerprint_oracle(),
        "text_redact": _text_redact_oracle(),
        "text_sample": _sample_oracle(rate=0.2, seed=7),
        "text_sample_strat": _sample_strat_oracle(),
        "dedup_embedding_lsh": _embedding_lsh_oracle(),
        "knn_lsh": _knn_lsh_oracle(),
        "knn_ivf": _knn_ivf_oracle(),
        # fake-decode plumbing: every payload is non-null utf-8 text, so
        # decode_ok is uniformly TRUE and the feature dim is the requested 16
        "mm_image_decode": """
            SELECT doc_id, TRUE AS decode_ok, CAST(16 AS INT) AS feat_dim
            FROM documents""",
        # fake-decode audio: duration/rms derive from sha256(utf-8 payload)
        # exactly as the kernel computes them (little-endian uint32 of
        # digest bytes [0:4) and [4:8))
        "mm_audio": """
            WITH h AS (SELECT doc_id, sha256(text) AS hx,
                              octet_length(encode(text)) AS nb
                       FROM documents)
            SELECT doc_id,
                   CAST(concat('0x', substr(hx,7,2), substr(hx,5,2),
                               substr(hx,3,2), substr(hx,1,2)) AS BIGINT)
                     % 60000 AS duration_ms,
                   round(CAST(concat('0x', substr(hx,15,2), substr(hx,13,2),
                                     substr(hx,11,2), substr(hx,9,2)) AS BIGINT)
                         / 4294967296.0, 6) AS rms,
                   CAST(nb AS BIGINT) AS n_samples,
                   TRUE AS decode_ok
            FROM h""",
        # conversation-structure operators: shared transcript derivation
        # (_TRANSCRIPT_CTE) + lag frame (_TURN_LAG_CTE) + the per-turn
        # error expression (_TURN_ERRS_SQL) mirror conversations.py exactly
        "conv_turn_errors": f"""
            WITH {_TRANSCRIPT_CTE},
            {_TURN_LAG_CTE}
            SELECT conv_id, turn_idx, role, {_TURN_ERRS_SQL} AS errs
            FROM lg""",
        "conv_report": f"""
            WITH {_TRANSCRIPT_CTE},
            {_TURN_LAG_CTE},
            e AS (
              SELECT conv_id, turn_idx, {_TURN_ERRS_SQL} AS errs FROM lg)
            SELECT conv_id,
                   count(*) AS n_turns,
                   CAST(coalesce(sum(CASE WHEN errs <> '' THEN 1 END), 0)
                        AS BIGINT) AS n_bad_turns,
                   -- min over an (order-key, code) struct mirrors the
                   -- engine's F.min(struct(o, code)) contract exactly: a
                   -- NULL ordering key sorts FIRST (Spark nulls-first ⇒
                   -- the BIGINT-min sentinel here; DuckDB min_by would
                   -- silently SKIP null-keyed rows), and same-turn ties
                   -- break by code ASC (min_by ties are nondeterministic)
                   min(CASE WHEN errs <> '' THEN struct_pack(
                         o := coalesce(turn_idx, -9223372036854775807 - 1),
                         code := string_split(errs, ',')[1]) END)['code']
                     AS first_err,
                   coalesce(sum(CASE WHEN errs <> '' THEN 1 END), 0) = 0
                     AS is_valid
            FROM e GROUP BY conv_id""",
        "conv_stutter": f"""
            WITH {_TRANSCRIPT_CTE},
            s AS (
              SELECT conv_id, turn_idx, role, substr(text, 1, 1) AS tkey,
                     lag(role) OVER w AS p_role,
                     lag(substr(text, 1, 1)) OVER w AS p_tkey,
                     row_number() OVER w AS rn
              FROM tr
              WINDOW w AS (PARTITION BY conv_id
                           ORDER BY turn_idx NULLS FIRST))
            SELECT conv_id, turn_idx, role, tkey
            FROM s
            WHERE NOT (role IS NOT DISTINCT FROM p_role
                       AND tkey IS NOT DISTINCT FROM p_tkey
                       AND rn > 1)""",
        "conv_truncate": f"""
            WITH {_TRANSCRIPT_CTE},
            c AS (
              SELECT conv_id, turn_idx,
                     CAST(length(text) AS BIGINT) AS n_tokens,
                     sum(coalesce(length(text), 0)) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM tr)
            SELECT conv_id, turn_idx, n_tokens FROM c WHERE cum <= 120""",
        "conv_render": f"""
            WITH {_TRANSCRIPT_CTE},
            r AS (
              SELECT conv_id,
                     count(*) AS n_turns,
                     string_agg('<|' || coalesce(role, '') || '|>'
                                || coalesce(text, ''),
                                chr(10) ORDER BY turn_idx) AS rendered
              FROM tr GROUP BY conv_id)
            SELECT conv_id, n_turns, CAST(length(rendered) AS BIGINT)
                     AS n_chars, rendered
            FROM r""",
        # conv_dedup: md5 of the same render expression conv_render
        # byte-attests; smallest conv_id per hash survives
        "conv_dedup": f"""
            WITH {_TRANSCRIPT_CTE},
            u AS (
              SELECT conv_id, turn_idx, role, text FROM tr
              UNION ALL
              SELECT conv_id || '_copy', turn_idx, role, text FROM tr),
            h AS (
              SELECT conv_id,
                     md5(string_agg('<|' || coalesce(role, '') || '|>'
                                    || coalesce(text, ''),
                                    chr(10) ORDER BY turn_idx)) AS conv_hash
              FROM u GROUP BY conv_id),
            w AS (
              SELECT conv_hash, min(conv_id) AS conv_id
              FROM h GROUP BY conv_hash)
            SELECT u.conv_id, u.turn_idx, u.role, w.conv_hash
            FROM u JOIN w USING (conv_id)""",
        # conv_features: latency stats over exact integer µs mirroring
        # conversation_features (sum/count/max of BIGINT, one final
        # double division, round-6); response = assistant following user
        "conv_features": f"""
            WITH {_TRANSCRIPT_CTE},
            lg AS (
              SELECT conv_id, role, text, ts,
                     lag(role) OVER w AS p_role,
                     lag(ts) OVER w AS p_ts
              FROM tr
              WINDOW w AS (PARTITION BY conv_id
                           ORDER BY turn_idx NULLS FIRST)),
            b AS (
              SELECT conv_id, role, ts,
                     coalesce(length(text), 0) AS chars,
                     (role IS NOT DISTINCT FROM 'assistant'
                      AND p_role IS NOT DISTINCT FROM 'user') AS is_resp,
                     CASE WHEN role IS NOT DISTINCT FROM 'assistant'
                               AND p_role IS NOT DISTINCT FROM 'user'
                          THEN epoch_us(ts) - epoch_us(p_ts) END AS lat_us
              FROM lg)
            SELECT conv_id,
                   count(*) AS n_turns,
                   CAST(sum(CASE WHEN role IS NOT DISTINCT FROM 'user'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_user_turns,
                   CAST(sum(CASE WHEN role IS NOT DISTINCT FROM 'assistant'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_assistant_turns,
                   CAST(sum(CASE WHEN role IS DISTINCT FROM 'user'
                                 AND role IS DISTINCT FROM 'assistant'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_other_turns,
                   CAST(sum(chars) AS BIGINT) AS total_chars,
                   round(CAST(sum(chars) AS DOUBLE) / count(*), 6)
                     AS avg_turn_chars,
                   CAST(sum(CASE WHEN is_resp THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_responses,
                   CASE WHEN count(lat_us) > 0
                        THEN round(CAST(sum(lat_us) AS DOUBLE)
                                   / count(lat_us) / 1000000.0, 6) END
                     AS avg_response_secs,
                   round(CAST(max(lat_us) AS DOUBLE) / 1000000.0, 6)
                     AS max_response_secs,
                   round(CAST(epoch_us(max(ts)) - epoch_us(min(ts))
                              AS DOUBLE) / 1000000.0, 6) AS duration_secs
            FROM b GROUP BY conv_id""",
        # mixture_sample: thresholds recomputed in-SQL with the exact FP
        # operation order of sampling.mixture_thresholds (normative:
        # ((D * w_d) * cnt_b) / (w_b * cnt_d), D = M31 portable); binding
        # domain = argmin(cnt/wt, lang); membership via the portable
        # doc_id hash (seed 11)
        "mixture_sample": f"""
            WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS cnt
                       FROM documents GROUP BY lang),
            w(lang, wt) AS (VALUES ('de', 0.2), ('en', 0.5), ('zh', 0.3)),
            j AS (SELECT c.lang, c.cnt, w.wt FROM c JOIN w USING (lang)),
            b AS (SELECT cnt AS cb, wt AS wb FROM j
                  ORDER BY cnt / wt, lang LIMIT 1),
            thr AS (SELECT j.lang,
                           least({_M31}, floor((({_M31} * j.wt) * b.cb)
                                               / (b.wb * j.cnt))) AS t
                    FROM j CROSS JOIN b)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN thr ON d.lang = thr.lang
            WHERE {_sample_hash_sql(11)} < thr.t""",
        # BM25 retrieval + bigram-LM scoring: micro-unit-quantized
        # contributions make both score sums exact integers, so the
        # oracles reproduce ranks AND scores bit-for-bit (see builders)
        "ret_bm25": _bm25_oracle(),
        "lm_bits": _lm_bits_oracle(),
        # the persisted-index path must be indistinguishable from the
        # cold path — same oracle by construction
        "ret_bm25_idx": _bm25_oracle(),
        "cluster_cap": _cluster_cap_oracle(),
        "lm_bucket": _lm_bucket_oracle(),
        "sem_dedup": _sem_dedup_oracle(),
        # conv_neardup: minhash over the conversation RENDER (same CTE
        # chain as dedup_minhash via the parameterized _minhash_body),
        # then the keep_canonical min-label closure; corpus = transcript
        # plus a '_v2' clone missing every 5th turn
        "conv_neardup": f"""
            WITH RECURSIVE {_TRANSCRIPT_CTE},
            uc AS (
              SELECT conv_id, turn_idx, role, text FROM tr
              UNION ALL
              SELECT conv_id || '_v2', turn_idx, role, text FROM tr
              WHERE turn_idx % 5 <> 3),
            rend AS (
              SELECT conv_id,
                     string_agg('<|' || coalesce(role, '') || '|>'
                                || coalesce(text, ''),
                                chr(10) ORDER BY turn_idx) AS rendered
              FROM uc GROUP BY conv_id),
            {_minhash_body(table="rend", id_col="conv_id",
                           text_col="rendered")},
            {_closure_sql(0.35)}
            SELECT conv_id, turn_idx, role FROM uc
            WHERE conv_id NOT IN (SELECT x FROM losers)""",
        # emb_pool: quantize-then-sum per (group, position); unnest and
        # generate_subscripts expand the embedding in lockstep. qsums =
        # the exact integer component sums, the order-independent surface
        "emb_pool": """
            WITH e AS (
              SELECT vec_id % 32 AS grp,
                     unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS pos
              FROM embeddings
              WHERE embedding IS NOT NULL),
            q AS (
              SELECT grp, pos,
                     sum(CAST(floor(CAST(x AS DOUBLE) * 1000000)
                              AS BIGINT)) AS s,
                     count(x) AS n
              FROM e GROUP BY grp, pos)
            SELECT grp,
                   CAST(max(n) AS BIGINT) AS n_pooled,
                   array_to_string(list(CAST(s AS VARCHAR) ORDER BY pos),
                                   ',') AS qsums
            FROM q GROUP BY grp""",
        # split_assign: thresholds replicate assign_splits' EXACT float64
        # accumulation (cum += w, int(cum * M31)) in Python, so the CASE
        # literals are the engine's own ints; hash = the shared portable
        # sample-hash mirror
        "split_assign": _split_assign_oracle(),
        # corpus_report: whitespace token count mirrors text_tokens; p50 =
        # quantile_cont == Spark percentile (same percentile_cont
        # interpolation); NULL text excluded from shape stats, counted in
        # n_null_text
        "corpus_report": r"""
            WITH t AS (
              SELECT lang, source, text,
                     CASE WHEN text IS NULL THEN NULL
                          WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                     END AS toks,
                     length(text) AS chars
              FROM documents),
            g AS (
              SELECT lang, source,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_null_text,
                     CAST(coalesce(sum(toks), 0) AS BIGINT) AS total_tokens,
                     round(avg(toks), 6) AS mean_tokens,
                     round(quantile_cont(toks, 0.5), 6) AS p50_tokens,
                     CAST(min(toks) AS BIGINT) AS min_tokens,
                     CAST(max(toks) AS BIGINT) AS max_tokens,
                     CAST(coalesce(sum(chars), 0) AS BIGINT) AS total_chars
              FROM t GROUP BY lang, source),
            tot AS (SELECT count(*) AS cr FROM documents)
            SELECT g.*, round(CAST(n_docs AS DOUBLE) / cr, 6) AS share
            FROM g CROSS JOIN tot""",
        # conv_curate: the composed curation DAG — structural quarantine
        # (re-densified corpus ∪ '_copy' exact clone ∪ '_v2' edited-text
        # near clone), stutter filter, md5-render exact dedup, then the
        # parameterized minhash CTE + min-label closure over the
        # exact-dedup survivors' renders. CTE names avoid the minhash
        # body's toks/grams/sigs/banded/sized/pairs/v namespace.
        "conv_curate": f"""
            WITH RECURSIVE {_TRANSCRIPT_CTE},
            b0 AS (
              SELECT conv_id,
                     CAST(row_number() OVER (PARTITION BY conv_id
                                             ORDER BY turn_idx) - 1
                          AS BIGINT) AS turn_idx,
                     text, ts
              FROM tr),
            b1 AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN turn_idx = 0 THEN 'system'
                          WHEN turn_idx % 2 = 1 THEN 'user'
                          ELSE 'assistant' END AS role,
                     text, ts
              FROM b0 WHERE turn_idx < 9),
            base AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN turn_idx = 8 THEN lag(role) OVER wb
                          ELSE role END AS role,
                     CASE WHEN turn_idx = 8 THEN lag(text) OVER wb
                          ELSE text END AS text,
                     ts
              FROM b1
              WINDOW wb AS (PARTITION BY conv_id
                            ORDER BY turn_idx NULLS FIRST)),
            uc AS (
              SELECT * FROM base
              UNION ALL
              SELECT conv_id || '_copy', turn_idx, role, text, ts FROM base
              UNION ALL
              SELECT conv_id || '_v2', turn_idx, role,
                     CASE WHEN turn_idx % 7 = 3 THEN text || ' edited'
                          ELSE text END, ts
              FROM base),
            st AS (
              SELECT conv_id, turn_idx, role, text, ts FROM (
                SELECT conv_id, turn_idx, role, text, ts,
                       lag(role) OVER ws AS p_role,
                       lag(text) OVER ws AS p_text,
                       row_number() OVER ws AS rn
                FROM uc
                WINDOW ws AS (PARTITION BY conv_id
                              ORDER BY turn_idx NULLS FIRST))
              WHERE NOT (role IS NOT DISTINCT FROM p_role
                         AND text IS NOT DISTINCT FROM p_text
                         AND rn > 1)),
            clg AS (
              SELECT conv_id, turn_idx, role, text, ts,
                     row_number() OVER wc AS rn,
                     lag(turn_idx) OVER wc AS p_turn,
                     lag(role) OVER wc AS p_role,
                     lag(ts) OVER wc AS p_ts
              FROM st
              WINDOW wc AS (PARTITION BY conv_id
                            ORDER BY turn_idx NULLS FIRST)),
            bad AS (
              SELECT conv_id
              FROM (SELECT conv_id, {_TURN_ERRS_SQL} AS errs FROM clg)
              GROUP BY conv_id
              HAVING sum(CASE WHEN errs <> '' THEN 1 ELSE 0 END) > 0),
            vt AS (
              SELECT conv_id, turn_idx, role, text FROM st
              WHERE conv_id NOT IN (SELECT conv_id FROM bad)),
            rend0 AS (
              SELECT conv_id,
                     string_agg('<|' || coalesce(role, '') || '|>'
                                || coalesce(text, ''),
                                chr(10) ORDER BY turn_idx) AS rendered
              FROM vt GROUP BY conv_id),
            hx AS (SELECT conv_id, md5(rendered) AS h FROM rend0),
            win AS (SELECT h, min(conv_id) AS conv_id FROM hx GROUP BY h),
            ex AS (SELECT vt.* FROM vt JOIN win USING (conv_id)),
            rend AS (SELECT r.conv_id, r.rendered
                     FROM rend0 r JOIN win USING (conv_id)),
            {_minhash_body(table="rend", id_col="conv_id",
                           text_col="rendered")},
            {_closure_sql(0.35)}
            SELECT conv_id, turn_idx, role FROM ex
            WHERE conv_id NOT IN (SELECT x FROM losers)""",
    }
