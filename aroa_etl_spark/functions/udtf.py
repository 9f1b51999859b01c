"""Python UDTF surface (§2.10 extension): table-generating functions.

The reference has NO UDTF surface (SURVEY §2.10: multiplicity lives in
positional columns). Spark 4 adds first-class Python UDTFs; the engine
exposes the extension point with one real, genuinely-non-relational
member: recursive flattening of ARBITRARY nested JSON into
(path, value, type) rows. ``from_json`` needs a schema and
``explode(map)`` handles one level — unknown-depth heterogeneous JSON
is exactly where a table function earns its place.

Performance: registered UDTFs should run Arrow-optimized
(``spark.sql.execution.pythonUDTF.arrow.enabled=true``, runtime
settable — set by :func:`register_engine_udtfs`); the plan node is then
ArrowEvalPythonUDTF, keeping the engine's no-row-at-a-time-Python
invariant (tests/test_plan_invariants.py).
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="path string, value string, json_type string", useArrow=True)
class JsonFlatten:
    """Yield one (path, canonical-value, type) row per scalar leaf of a
    JSON document. Paths are dotted for objects and ``[i]``-indexed for
    arrays (``meta.tags[1]``). Canonical values: strings raw, ints as
    decimal digits, floats via repr, booleans ``true``/``false``, JSON
    null as ``null`` with type 'null'. Malformed JSON yields a single
    (path='', type='error') row rather than failing the task."""

    def eval(self, doc: str):  # noqa: D102 — contract in class docstring
        if doc is None:
            return
        try:
            parsed = json.loads(doc)
        except (ValueError, TypeError):
            yield ("", None, "error")
            return
        yield from self._walk("", parsed)

    def _walk(self, path: str, node):
        if isinstance(node, dict):
            for k in node:
                sub = f"{path}.{k}" if path else str(k)
                yield from self._walk(sub, node[k])
        elif isinstance(node, list):
            for i, v in enumerate(node):
                yield from self._walk(f"{path}[{i}]", v)
        elif node is None:
            yield (path, "null", "null")
        elif isinstance(node, bool):
            yield (path, "true" if node else "false", "boolean")
        elif isinstance(node, int):
            yield (path, str(node), "integer")
        elif isinstance(node, float):
            yield (path, repr(node), "double")
        else:
            yield (path, str(node), "string")


def register_engine_udtfs(spark) -> None:
    """Register the engine's UDTFs on a session (idempotent) and turn on
    Arrow-optimized UDTF evaluation."""
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("json_flatten", JsonFlatten)
