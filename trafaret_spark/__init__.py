"""trafaret_spark — a PySpark-native schema-validation + feature-engineering engine.

Re-expresses the check()/coerce contract of Deepwalker/trafaret (reference at
/root/reference, pure-Python row-at-a-time combinators) as a vectorized,
partition-parallel stage compiled to Spark Column expressions, feeding a
point-in-time as-of join + windowed feature layer over conversation-transcript
tables.

Design rules (SURVEY.md §2, §4):
  * DataFrame/columnar end-to-end; leaf guards compile to native Column
    expressions (whole-stage codegen); Arrow pandas UDFs only for the `Call`
    escape hatch and permissive datetime parsing; never per-row Python.
  * Error model: per-row ``errors: array<struct<path,code,message>>`` column
    with trafaret's stable snake_case code vocabulary (reference
    trafaret/codes.py:1-70), accumulate-all at row scope.
"""

from trafaret_spark import codes
from trafaret_spark.guards import (
    Any,
    AnyString,
    Atom,
    Bool,
    Bytes,
    Call,
    Callable,
    Date,
    DateTime,
    DateTimeAny,
    Email,
    Enum,
    Float,
    FromBytes,
    Guard,
    Hex,
    Int,
    IP,
    IPv4,
    IPv6,
    List,
    Mapping,
    MongoId,
    Null,
    OnError,
    Regexp,
    RegexpRaw,
    RegexpString,
    String,
    Subclass,
    ToBool,
    ToBytes,
    ToDate,
    ToDateTime,
    ToDecimal,
    ToFloat,
    ToInt,
    Tuple,
    Type,
    URL,
    URLSafe,
    WithRepr,
)
from trafaret_spark.reshape import fold, split, unfold
from trafaret_spark.schema import (
    DictGuard,
    DictKeys,
    Forward,
    Key,
    KeysSubset,
    Schema,
    SchemaError,
    confirm_key,
    construct,
    subdict,
    xor_key,
)
from trafaret_spark.validate import (
    GuardError,
    apply_schema,
    catch,
    catch_error,
    errors_as_map,
    errors_json,
    extract_error,
    guard,
    ignore,
    split_valid,
    validation_metrics,
)

__all__ = [
    "codes",
    # guards
    "Guard", "Any", "Null", "Atom", "Enum", "Bool", "ToBool",
    "Int", "ToInt", "Float", "ToFloat", "ToDecimal",
    "String", "Bytes", "AnyString", "ToBytes", "FromBytes",
    "Date", "ToDate", "DateTime", "ToDateTime", "DateTimeAny",
    "Regexp", "RegexpRaw", "RegexpString", "Email", "URL", "Hex", "URLSafe",
    "IPv4", "IPv6", "IP", "MongoId",
    "List", "Tuple", "Mapping", "OnError", "WithRepr", "Call",
    "Callable", "Type", "Subclass",
    # schema
    "Key", "Schema", "SchemaError", "DictGuard", "DictKeys", "construct",
    "xor_key", "confirm_key", "subdict", "KeysSubset", "Forward",
    # validate
    "apply_schema", "split_valid", "validation_metrics",
    "errors_json", "errors_as_map", "guard", "GuardError",
    "catch", "catch_error", "extract_error", "ignore",
    # reshape
    "unfold", "fold", "split",
]

__version__ = "0.1.0"
