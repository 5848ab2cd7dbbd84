"""Route/shard-key template rendering — the T1 transform (tmpl.go:21-51).

The reference renders Go ``text/template`` with the sprig function library
(tmpl.go:29-51 registers sprig plus toJson/fromJson/toYaml/fromYaml/
fromYamlArray/fromJsonArray/toToml, and keeps ``env``). We implement the
documented template surface plus sprig's common core over the same item
model (``.ItemID``, ``.Log.*``, ``.Data.*``, ``.Data.Rows``), so reference
templates work unchanged:

- ``{{ .Path.To.Field }}``            — dotted field access
- ``{{ (index .Data.Rows 0).col }}``  — row indexing (the key-template shape)
- ``{{- ... }}`` / ``{{ ... -}}``     — whitespace trim markers
- pipes and calls with arguments:     ``toJson`` ``fromJson``
  ``fromJsonArray`` ``toYaml`` ``fromYaml`` ``fromYamlArray`` ``upper``
  ``lower`` ``title`` ``trim`` ``quote`` ``squote`` ``default`` ``coalesce``
  ``printf`` ``b64enc`` ``b64dec`` ``env`` ``index``

Anything else (the long tail of sprig) still fails fast at COMPILE time —
rendering wrong beats rendering silently, and compile_routes runs at build
time (blsenderwork.go:102-105 parity), so a bad template kills the job
before any event flows.

``native_key_expr`` additionally compiles the documented shard-key shapes
straight to a Spark column expression so the hot path has no Python at all
(see pipeline._shard_filter).
"""

from __future__ import annotations

import base64
import json
import os
import re
from typing import Any

_EXPR_RE = re.compile(r"\{\{-?\s*(.*?)\s*-?\}\}", re.S)
_FIELD_RE = re.compile(r"^\.(?:[A-Za-z_][A-Za-z0-9_]*)(?:\.[A-Za-z_][A-Za-z0-9_]*)*$")
_INDEX_RE = re.compile(
    r"^\(\s*index\s+(\.[A-Za-z_.0-9]*)\s+(\d+)\s*\)\.([A-Za-z_][A-Za-z0-9_]*)$"
)
_TOKEN_RE = re.compile(r'"(?:[^"\\]|\\.)*"|[^\s]+')
_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")


def _to_json(value: Any) -> str:
    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)


def _go_str(value: Any) -> str:
    """Render a value the way the reference's templates print it: Go
    booleans are lowercase, nil is the empty string, containers JSON."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (dict, list)):
        return _to_json(value)
    return str(value)


def _lookup(item: dict, dotted: str) -> Any:
    value: Any = item
    for part in dotted.strip(".").split("."):
        if not isinstance(value, dict) or part not in value:
            raise KeyError(f"template field '{dotted}' not found on item")
        value = value[part]
    return value


def _sprig_empty(v: Any) -> bool:
    """sprig's emptiness rule (defaults.go): nil, false, 0, "", empty
    collection."""
    if v is None or v is False:
        return True
    if isinstance(v, (int, float)) and not isinstance(v, bool) and v == 0:
        return True
    if isinstance(v, (str, list, dict, tuple)) and len(v) == 0:
        return True
    return False


def _printf(fmt: str, *args: Any) -> str:
    """Minimal Go fmt.Sprintf: %v %s %d %f %q %% (no width/precision —
    unsupported verbs raise at render time)."""
    out: list[str] = []
    i = 0
    argi = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            verb = fmt[i + 1]
            i += 2
            if verb == "%":
                out.append("%")
                continue
            if argi >= len(args):
                raise ValueError(f"printf: missing argument for %{verb}")
            a = args[argi]
            argi += 1
            if verb in ("v", "s"):
                out.append(_go_str(a))
            elif verb == "d":
                out.append(str(int(a)))
            elif verb == "f":
                out.append("%f" % float(a))
            elif verb == "q":
                out.append(json.dumps(_go_str(a), ensure_ascii=False))
            else:
                raise ValueError(f"printf: unsupported verb %{verb}")
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _yaml():
    import yaml as _y

    return _y


def _default(default_value: Any, *given: Any) -> Any:
    # sprig: default d v → v unless empty, else d.
    if given and not _sprig_empty(given[0]):
        return given[0]
    return default_value


def _coalesce(*vals: Any) -> Any:
    for v in vals:
        if not _sprig_empty(v):
            return v
    return None


def _index(collection: Any, *keys: Any) -> Any:
    value = collection
    for k in keys:
        if isinstance(value, dict):
            value = value[k]
        else:
            value = value[int(k)]
    return value


_FUNCS: dict[str, Any] = {
    # tmpl.go:38-47 extras
    "toJson": lambda v: _to_json(v),
    "fromJson": lambda s: json.loads(s),
    "fromJsonArray": lambda s: json.loads(s),
    # helm/sprig strip the trailing newline from toYaml output
    "toYaml": lambda v: _yaml().safe_dump(v, default_flow_style=False).rstrip("\n"),
    "fromYaml": lambda s: _yaml().safe_load(s),
    "fromYamlArray": lambda s: _yaml().safe_load(s),
    # sprig common core (tmpl.go keeps env enabled; only expandenv is removed)
    "upper": lambda s: str(s).upper(),
    "lower": lambda s: str(s).lower(),
    "title": lambda s: str(s).title(),
    "trim": lambda s: str(s).strip(),
    "quote": lambda *vs: " ".join(json.dumps(_go_str(v), ensure_ascii=False) for v in vs),
    "squote": lambda *vs: " ".join("'" + _go_str(v) + "'" for v in vs),
    "default": _default,
    "coalesce": _coalesce,
    "printf": _printf,
    "b64enc": lambda s: base64.b64encode(str(s).encode("utf-8")).decode("ascii"),
    "b64dec": lambda s: base64.b64decode(str(s)).decode("utf-8"),
    "env": lambda name: os.environ.get(str(name), ""),
    "index": _index,
}


def _split_pipes(expr: str) -> list[str]:
    """Split on | outside quotes/parens."""
    segments: list[str] = []
    depth = 0
    quoted = False
    cur: list[str] = []
    i = 0
    while i < len(expr):
        c = expr[i]
        if quoted:
            cur.append(c)
            if c == "\\" and i + 1 < len(expr):
                cur.append(expr[i + 1])
                i += 2
                continue
            if c == '"':
                quoted = False
        elif c == '"':
            quoted = True
            cur.append(c)
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "|" and depth == 0:
            segments.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    segments.append("".join(cur).strip())
    return segments


def _operand_value(token: str, item: dict) -> Any:
    if token == ".":
        return item
    if _FIELD_RE.match(token):
        return _lookup(item, token)
    if token.startswith('"'):
        return json.loads(token)
    if _NUM_RE.match(token):
        return float(token) if "." in token else int(token)
    if token in ("true", "false"):
        return token == "true"
    if token == "nil":
        return None
    raise ValueError(f"unsupported template operand: {token!r}")


_NOPIPE = object()


def _eval_segment(segment: str, item: dict, piped: Any = _NOPIPE) -> Any:
    m = _INDEX_RE.match(segment)
    if m:
        if piped is not _NOPIPE:
            raise ValueError(f"cannot pipe into {segment!r}")
        seq = _lookup(item, m.group(1))
        return seq[int(m.group(2))][m.group(3)]
    tokens = _TOKEN_RE.findall(segment)
    if not tokens:
        raise ValueError("empty template expression segment")
    head = tokens[0]
    if head in _FUNCS:
        args = [_operand_value(t, item) for t in tokens[1:]]
        if piped is not _NOPIPE:
            args.append(piped)  # Go pipes append the piped value LAST
        return _FUNCS[head](*args)
    if len(tokens) != 1:
        raise ValueError(f"unsupported template expression: {{{{ {segment} }}}}")
    if piped is not _NOPIPE:
        raise ValueError(f"cannot pipe into operand {head!r}")
    return _operand_value(head, item)


def _eval_expr(expr: str, item: dict) -> str:
    segments = _split_pipes(expr)
    value: Any = _eval_segment(segments[0], item)
    for seg in segments[1:]:
        value = _eval_segment(seg, item, piped=value)
    if isinstance(value, (dict, list)):
        return _to_json(value)
    return _go_str(value)


def _validate_expr(expr: str) -> None:
    """Compile-time validation: every segment must be a known operand shape
    or a registered function; unknown constructs raise here, before any
    event flows (blsenderwork.go:102-105 fail-fast parity)."""
    for n, seg in enumerate(_split_pipes(expr)):
        if _INDEX_RE.match(seg):
            continue
        tokens = _TOKEN_RE.findall(seg)
        if not tokens:
            raise ValueError(f"unsupported template expression: {{{{ {expr} }}}}")
        head = tokens[0]
        if head in _FUNCS:
            for t in tokens[1:]:
                if not (
                    _FIELD_RE.match(t)
                    or t.startswith('"')
                    or _NUM_RE.match(t)
                    or t in (".", "true", "false", "nil")
                ):
                    raise ValueError(f"unsupported template operand: {t!r}")
            continue
        if len(tokens) == 1 and (
            _FIELD_RE.match(head) or head == "." or head.startswith('"')
            or _NUM_RE.match(head) or head in ("true", "false", "nil")
        ):
            if n > 0:
                raise ValueError(f"cannot pipe into operand {head!r}")
            continue
        raise ValueError(f"unsupported template expression: {{{{ {seg} }}}}")


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
            _validate_expr(p[1])

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


# Item fields that map 1:1 onto envelope columns (item_from_row below);
# used by native_key_expr to compile key templates to column expressions.
_NATIVE_FIELDS = {
    ".ItemID": "item_id",
    ".Log.EventType": "event_type",
    ".Log.BinlogFile": "binlog_file",
    ".Log.BinlogPosition": "binlog_position",
    ".Data.Database": "database",
    ".Data.Table": "table",
    ".Data.Operation": "operation",
}


def native_key_expr(template: str):
    """Compile a shard-key template to a pure Spark column expression, or
    return None when the template needs the general renderer.

    The documented key-template shape ``{{ (index .Data.Rows 0).col }}``
    (docs/binwatch.v1alpha2.yaml:69-75) and plain dotted fields become
    ``rows[0]['col']`` / column refs stitched with concat — no Python eval
    node in the plan, so the R1 filter stays in whole-stage codegen right up
    to the FNV hash itself. Null/missing semantics match the renderer's
    error fallback: a missing map key or out-of-range row index yields NULL
    (concat propagates it), and pipeline._shard_filter's when() then selects
    the position-hash fallback, exactly as a render exception would.
    """
    from pyspark.sql import functions as F

    exprs: list[Any] = []  # literal str | Column
    pos = 0
    for m in _EXPR_RE.finditer(template):
        lit = template[pos : m.start()]
        if m.group(0).startswith("{{-"):
            lit = lit.rstrip()
        # rtrim of the FOLLOWING literal is applied when that literal lands
        if exprs and isinstance(exprs[-1], tuple) and exprs[-1] == ("rtrim",):
            exprs.pop()
            lit = lit.lstrip()
        if lit:
            exprs.append(lit)
        body = m.group(1)
        if "|" in body:
            return None  # pipes → general renderer
        idx = _INDEX_RE.match(body)
        if idx:
            if idx.group(1) != ".Data.Rows":
                return None
            # get/try_element_at, not [] — ANSI mode (Spark 4 default) makes
            # [] raise on out-of-range/missing; the renderer's error contract
            # here is NULL → position fallback.
            col = F.try_element_at(
                F.get(F.col("rows"), F.lit(int(idx.group(2)))),
                F.lit(idx.group(3)),
            )
        elif body in _NATIVE_FIELDS:
            col = F.col(_NATIVE_FIELDS[body]).cast("string")
        else:
            return None
        exprs.append(col)
        pos = m.end()
        if m.group(0).endswith("-}}"):
            exprs.append(("rtrim",))
    tail = template[pos:]
    if exprs and isinstance(exprs[-1], tuple) and exprs[-1] == ("rtrim",):
        exprs.pop()
        tail = tail.lstrip()
    if tail:
        exprs.append(tail)
    if not any(not isinstance(p, str) for p in exprs):
        return None  # constant template — let the renderer handle it
    cols = [F.lit(p) if isinstance(p, str) else p for p in exprs]
    return cols[0] if len(cols) == 1 else F.concat(*cols)


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
