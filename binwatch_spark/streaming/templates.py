"""Route/shard-key template rendering — the T1 transform (tmpl.go:21-51).

The reference renders Go ``text/template`` with the sprig function library
against the full item. We implement the *documented* template surface — the
JSON output shape and key templates the reference's own docs use
(docs/binwatch.v1alpha2.yaml:48,69-75) — over the same item model
(``.ItemID``, ``.Log.*``, ``.Data.*``, ``.Data.Rows``), so reference
templates work unchanged:

- ``{{ .Path.To.Field }}``         — dotted field access
- ``{{ .Data.Rows | toJson }}``    — toJson pipe (tmpl.go:114-121)
- ``{{- ... }}`` / ``{{ ... -}}``  — whitespace trim markers
- ``{{ (index .Data.Rows 0).col }}`` — row indexing (the key-template shape)

The full sprig surface is out of scope by design (SURVEY §7.3): templates
beyond this subset raise at compile time rather than render wrong.
An item renders with ``render(template, item)``; items are plain dicts with
reference-named keys (ItemID / Log / Data), built by ``item_from_row``.
"""

from __future__ import annotations

import json
import re
from typing import Any

_EXPR_RE = re.compile(r"\{\{-?\s*(.*?)\s*-?\}\}", re.S)
_FIELD_RE = re.compile(r"^\.(?:[A-Za-z_][A-Za-z0-9_]*)(?:\.[A-Za-z_][A-Za-z0-9_]*)*$")
_INDEX_RE = re.compile(
    r"^\(\s*index\s+(\.[A-Za-z_.0-9]*)\s+(\d+)\s*\)\.([A-Za-z_][A-Za-z0-9_]*)$"
)


def _to_json(value: Any) -> str:
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)


def _lookup(item: dict, dotted: str) -> Any:
    value: Any = item
    for part in dotted.strip(".").split("."):
        if not isinstance(value, dict) or part not in value:
            raise KeyError(f"template field '{dotted}' not found on item")
        value = value[part]
    return value


def _eval_expr(expr: str, item: dict) -> str:
    parts = [p.strip() for p in expr.split("|")]
    head, pipes = parts[0], parts[1:]

    m = _INDEX_RE.match(head)
    if m:
        seq = _lookup(item, m.group(1))
        value = seq[int(m.group(2))][m.group(3)]
    elif _FIELD_RE.match(head):
        value = _lookup(item, head)
    else:
        raise ValueError(f"unsupported template expression: {{{{ {expr} }}}}")

    for pipe in pipes:
        if pipe == "toJson":
            value = _to_json(value)
        else:
            raise ValueError(f"unsupported template function: {pipe}")

    if isinstance(value, (dict, list)):
        return _to_json(value)
    return str(value)


def compile_template(template: str):
    """Parse once (blsenderwork.go:102-105 compile-at-build parity); returns
    a render(item) callable. Raises on unsupported constructs."""
    pieces: list[Any] = []
    pos = 0
    for m in _EXPR_RE.finditer(template):
        lit = template[pos : m.start()]
        if m.group(0).startswith("{{-"):
            lit = lit.rstrip()
        pieces.append(lit)
        pieces.append(("expr", m.group(1)))
        pos = m.end()
        if m.group(0).endswith("-}}"):
            # trim following whitespace: handled when stitching below
            pieces.append(("rtrim",))
    pieces.append(template[pos:])

    # validate expressions at compile time
    for p in pieces:
        if isinstance(p, tuple) and p[0] == "expr":
            expr = p[1]
            if not (_INDEX_RE.match(expr.split("|")[0].strip()) or _FIELD_RE.match(expr.split("|")[0].strip())):
                raise ValueError(f"unsupported template expression: {{{{ {expr} }}}}")

    def render(item: dict) -> str:
        out: list[str] = []
        trim_next = False
        for p in pieces:
            if isinstance(p, tuple):
                if p[0] == "expr":
                    out.append(_eval_expr(p[1], item))
                elif p[0] == "rtrim":
                    trim_next = True
                continue
            text = p
            if trim_next:
                text = text.lstrip()
                trim_next = False
            out.append(text)
        return "".join(out)

    return render


def item_from_row(row: dict, item_id: int) -> dict:
    """Envelope row → reference-shaped item (pools.go:17-35 naming)."""
    return {
        "ItemID": item_id,
        "Log": {
            "EventType": row.get("event_type"),
            "BinlogFile": row.get("binlog_file"),
            "BinlogPosition": row.get("binlog_position"),
        },
        "Data": {
            "Database": row.get("database"),
            "Table": row.get("table"),
            "Operation": row.get("operation"),
            "Rows": row.get("rows") or [],
        },
    }
