"""Declared-schema compiler: metadata JSON schema dict -> Spark StructType.

Parity surface (reference: ``pipeline/schema_enforcer.py:25-129``):

- closed set of 8 primitive type names mapped 1:1 to Spark types
  (``schema_enforcer.py:25-34``);
- strict structural validation of the schema document: top-level must be
  ``{"type": "struct", "fields": [...]}`` with a non-empty fields list
  (``schema_enforcer.py:47-63``); each field needs ``name`` (non-empty str),
  ``type`` (known name), ``nullable`` (bool) (``schema_enforcer.py:75-110``);
  unknown type names raise ``ValueError`` (``schema_enforcer.py:113-118``);
- ``metadata.description`` is documentation-only (``schema_enforcer.py:122-124``).

Extension beyond the reference (needed for the testdata and the LLM-pipeline
operators): ``array<T>``, ``map<K,V>``, ``binary``, ``decimal(p,s)`` and
nested ``struct`` type forms. The reference rejects these; we accept them but
keep the same strictness for malformed documents.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import types as T

# Reference parity: the 8 primitives at schema_enforcer.py:25-34.
_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    # Extensions (not in the reference type set):
    "binary": T.BinaryType(),
    "short": T.ShortType(),
    "byte": T.ByteType(),
}

_ARRAY_RE = re.compile(r"^array<(.+)>$")
_MAP_RE = re.compile(r"^map<([^,]+),\s*(.+)>$")
_DECIMAL_RE = re.compile(r"^decimal\((\d+),\s*(\d+)\)$")


def _parse_type(type_spec: Any) -> T.DataType:
    """Parse a type spec: primitive name, array<...>/map<...>/decimal(p,s)
    string form, or a nested struct dict."""
    if isinstance(type_spec, dict):
        return build_struct_type(type_spec)
    if not isinstance(type_spec, str):
        raise ValueError(
            f"Field type must be a string or nested struct dict, got {type(type_spec).__name__}"
        )
    name = type_spec.strip()
    if name in _PRIMITIVES:
        return _PRIMITIVES[name]
    m = _ARRAY_RE.match(name)
    if m:
        return T.ArrayType(_parse_type(m.group(1)))
    m = _MAP_RE.match(name)
    if m:
        return T.MapType(_parse_type(m.group(1)), _parse_type(m.group(2)))
    m = _DECIMAL_RE.match(name)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    raise ValueError(
        f"Unsupported field type: '{type_spec}'. Supported primitives: "
        f"{sorted(_PRIMITIVES)} plus array<T>, map<K,V>, decimal(p,s), nested struct"
    )


def build_struct_type(schema_doc: dict[str, Any]) -> T.StructType:
    """Compile a metadata schema document to a ``StructType``.

    Raises ``ValueError`` with a descriptive message on any structural
    problem (parity with schema_enforcer.py:40-118's error behavior).
    """
    if not isinstance(schema_doc, dict):
        raise ValueError(f"Schema must be a dict, got {type(schema_doc).__name__}")
    if schema_doc.get("type") != "struct":
        raise ValueError(
            f"Schema 'type' must be 'struct', got {schema_doc.get('type')!r}"
        )
    fields = schema_doc.get("fields")
    if not isinstance(fields, list) or not fields:
        raise ValueError("Schema 'fields' must be a non-empty list")

    struct_fields: list[T.StructField] = []
    seen: set[str] = set()
    for i, field in enumerate(fields):
        if not isinstance(field, dict):
            raise ValueError(f"Schema field #{i} must be a dict, got {type(field).__name__}")
        name = field.get("name")
        if not isinstance(name, str) or not name:
            raise ValueError(f"Schema field #{i}: 'name' must be a non-empty string")
        if name in seen:
            raise ValueError(f"Schema field '{name}' declared more than once")
        seen.add(name)
        if "type" not in field:
            raise ValueError(f"Schema field '{name}': missing 'type'")
        nullable = field.get("nullable")
        if not isinstance(nullable, bool):
            raise ValueError(f"Schema field '{name}': 'nullable' must be a boolean")
        dtype = _parse_type(field["type"])
        # metadata.description is documentation-only (schema_enforcer.py:122-124)
        metadata = field.get("metadata") if isinstance(field.get("metadata"), dict) else None
        struct_fields.append(T.StructField(name, dtype, nullable, metadata=metadata))
    return T.StructType(struct_fields)


def struct_type_to_doc(st: T.StructType) -> dict[str, Any]:
    """Inverse of :func:`build_struct_type` for round-tripping engine state."""
    def type_name(dt: T.DataType) -> Any:
        for n, t in _PRIMITIVES.items():
            if dt == t:
                return n
        if isinstance(dt, T.ArrayType):
            return f"array<{type_name(dt.elementType)}>"
        if isinstance(dt, T.MapType):
            return f"map<{type_name(dt.keyType)},{type_name(dt.valueType)}>"
        if isinstance(dt, T.DecimalType):
            return f"decimal({dt.precision},{dt.scale})"
        if isinstance(dt, T.StructType):
            return struct_type_to_doc(dt)
        raise ValueError(f"Cannot serialize type {dt}")

    return {
        "type": "struct",
        "fields": [
            {"name": f.name, "type": type_name(f.dataType), "nullable": f.nullable}
            for f in st.fields
        ],
    }
