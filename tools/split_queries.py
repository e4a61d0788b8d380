"""Split plans/queries.py (20.9k lines) into plans/families/*.py
(VERDICT r9 ask #4) with BYTE-IDENTICAL registry order.

Mechanics: parse the file with ast, keep the shared preamble (imports,
table readers, dsum helpers, QUERIES/ORACLE_SQL/register) as
plans/_core.py, then chop the remaining top-level statements — in
order, cutting only between statements — into chunks of <= MAX_LINES.
Each chunk becomes plans/families/fNN_<slug>.py that imports the core
names plus any names defined by EARLIER chunks that it references
(linear-script semantics preserved: always import from the most
recent earlier definer). plans/queries.py becomes a facade that
imports _core + every family module in order and re-exports ALL their
names (including underscore helpers — tests import e.g. _RBO_D), so
every existing `from ...plans.queries import X` keeps working and
QUERIES insertion order is unchanged.

Safety checks (the script aborts rather than guess):
  * a chunk referencing a name defined only in a LATER chunk
    (late-binding forward reference — cannot be expressed as imports);
  * a top-level name defined in MORE THAN ONE chunk (a later import
    could silently pick the wrong generation).

Run:  python tools/split_queries.py          # writes the new layout
      python tools/split_queries.py --check  # dry run, prints plan
"""

from __future__ import annotations

import ast
import builtins
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "dpe_energy_performance_analysis_etl_spark", "plans")
SRC = os.path.join(PLANS, "queries.py")
FAM = os.path.join(PLANS, "families")
MAX_LINES = 1800

CORE_EXPORTS = [
    "annotations", "Callable", "DataFrame", "SparkSession", "Window", "F",
    "epoch_double", "epoch_micros", "epoch_seconds",
    "exact_cents_sum", "exact_sum_agg", "from_cents", "scaled_long",
    "TABLES", "load_tables", "read_events", "read_documents",
    "read_embeddings", "dsum", "davg", "dsum_fast", "davg_fast",
    "QUERIES", "ORACLE_SQL", "register",
]


def top_level_defs(node: ast.stmt) -> set[str]:
    names: set[str] = set()
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        names.add(node.name)
    elif isinstance(node, (ast.Assign, ast.AugAssign, ast.AnnAssign)):
        targets = node.targets if isinstance(node, ast.Assign) else [node.target]
        for t in targets:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    names.add(n.id)
    elif isinstance(node, (ast.Import, ast.ImportFrom)):
        for a in node.names:
            names.add((a.asname or a.name).split(".")[0])
    return names


def used_names(node: ast.stmt) -> set[str]:
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def main() -> int:
    check = "--check" in sys.argv
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    body = tree.body

    # Preamble ends right after `def register(...)`.
    reg_idx = next(
        i for i, n in enumerate(body)
        if isinstance(n, ast.FunctionDef) and n.name == "register"
    )
    preamble_nodes = body[: reg_idx + 1]
    rest = body[reg_idx + 1:]

    def span(node):
        start = min(
            [node.lineno] + [d.lineno for d in getattr(node, "decorator_list", [])]
        )
        return start, node.end_lineno

    # Chunk the remaining statements.
    chunks: list[list[ast.stmt]] = [[]]
    chunk_start_line = span(rest[0])[0] if rest else None
    for node in rest:
        s, e = span(node)
        if chunks[-1] and (e - chunk_start_line) > MAX_LINES:
            chunks.append([])
            chunk_start_line = s
        chunks[-1].append(node)

    core_defs = set(CORE_EXPORTS)
    chunk_defs: list[set[str]] = []
    chunk_uses: list[set[str]] = []
    for ch in chunks:
        d, u = set(), set()
        for node in ch:
            d |= top_level_defs(node)
            u |= used_names(node)
        chunk_defs.append(d)
        chunk_uses.append(u)

    # Safety: duplicate top-level definitions across chunks.
    all_defs: dict[str, list[int]] = {}
    for i, d in enumerate(chunk_defs):
        for name in d:
            all_defs.setdefault(name, []).append(i)
    dupes = {k: v for k, v in all_defs.items() if len(v) > 1}
    if dupes:
        print("ABORT: names defined in multiple chunks:", dupes)
        return 1

    builtin_names = set(dir(builtins))
    needed_imports: list[dict[int, list[str]]] = []
    forward = []
    for i, u in enumerate(chunk_uses):
        ext = u - chunk_defs[i] - core_defs - builtin_names
        per_chunk: dict[int, list[str]] = {}
        for name in sorted(ext):
            owners = all_defs.get(name)
            if not owners:
                continue  # local scope name (function params etc.)
            if owners[0] > i:
                forward.append((i, name, owners[0]))
            else:
                per_chunk.setdefault(owners[0], []).append(name)
        needed_imports.append(per_chunk)
    if forward:
        print("ABORT: forward references across chunks:", forward)
        return 1

    # Derive a slug per chunk from its first section banner or first
    # registered query name.
    slugs = []
    for ch in chunks:
        s, e = span(ch[0])[0], span(ch[-1])[1]
        text = "".join(lines[s - 1: e])
        m = re.search(r'@register\(\s*\n?\s*"(\w+)"', text) or re.search(
            r'"(\w+)"', text
        )
        slug = (m.group(1) if m else "misc")[:28]
        slugs.append(slug)
    names = []
    seen = set()
    for i, slug in enumerate(slugs):
        base = f"f{i:02d}_{slug}"
        while base in seen:
            base += "x"
        seen.add(base)
        names.append(base)

    print(f"{len(chunks)} chunks:")
    for i, ch in enumerate(chunks):
        s = span(ch[0])[0]
        e = span(ch[-1])[1]
        print(f"  {names[i]}: lines {s}-{e} ({e - s + 1}), "
              f"{len(chunk_defs[i])} defs, imports from "
              f"{sorted(needed_imports[i])}")
    if check:
        return 0

    os.makedirs(FAM, exist_ok=True)
    # _core.py: original preamble verbatim.
    pre_end = preamble_nodes[-1].end_lineno
    core_src = "".join(lines[:pre_end]) + "\n"
    with open(os.path.join(PLANS, "_core.py"), "w") as fh:
        fh.write(core_src)

    header_core = (
        "from dpe_energy_performance_analysis_etl_spark.plans._core import (  # noqa: F401\n"
        + "".join(f"    {n},\n" for n in CORE_EXPORTS if n != "annotations")
        + ")\n"
    )
    for i, ch in enumerate(chunks):
        s = span(ch[0])[0]
        e = span(ch[-1])[1]
        parts = [
            f'"""Query-registry family chunk {i} (auto-split from the\n'
            f'historical plans/queries.py lines {s}-{e}; registration\n'
            f'order preserved — see plans/queries.py facade)."""\n\n',
            "from __future__ import annotations\n\n",
            header_core,
        ]
        for j in sorted(needed_imports[i]):
            mod = f"dpe_energy_performance_analysis_etl_spark.plans.families.{names[j]}"
            parts.append(
                f"from {mod} import (  # noqa: F401\n"
                + "".join(f"    {n},\n" for n in needed_imports[i][j])
                + ")\n"
            )
        parts.append("\n")
        parts.append("".join(lines[s - 1: e]))
        with open(os.path.join(FAM, f"{names[i]}.py"), "w") as fh:
            fh.write("".join(parts))
    with open(os.path.join(FAM, "__init__.py"), "w") as fh:
        fh.write(
            '"""Family chunks of the query registry — imported IN ORDER\n'
            'by plans/queries.py (QUERIES insertion order is the\n'
            'contract; never reorder these imports)."""\n\n'
            "FAMILY_MODULES = [\n"
            + "".join(f'    "{n}",\n' for n in names)
            + "]\n"
        )

    facade = (
        '"""Query registry facade.\n\n'
        "The registry itself (QUERIES / ORACLE_SQL / register and the\n"
        "shared helpers) lives in plans/_core.py; the query definitions\n"
        "live in plans/families/fNN_*.py, auto-split from this file's\n"
        "historical 20.9k-line body (VERDICT r9 ask #4). Importing this\n"
        "module loads every family IN ORDER, so QUERIES insertion order\n"
        "is byte-identical to the pre-split file, and re-exports every\n"
        "name (including underscore helpers) so existing\n"
        "`from ...plans.queries import X` call sites keep working.\n"
        '"""\n\n'
        "from __future__ import annotations\n\n"
        "import importlib\n\n"
        "from dpe_energy_performance_analysis_etl_spark.plans import _core\n"
        "from dpe_energy_performance_analysis_etl_spark.plans.families import (\n"
        "    FAMILY_MODULES,\n"
        ")\n\n"
        "_ns = globals()\n"
        "for _name in [n for n in dir(_core) if not n.startswith('__')]:\n"
        "    _ns[_name] = getattr(_core, _name)\n"
        "for _mod_name in FAMILY_MODULES:\n"
        "    _mod = importlib.import_module(\n"
        "        'dpe_energy_performance_analysis_etl_spark.plans.families.' + _mod_name\n"
        "    )\n"
        "    for _name in [n for n in dir(_mod) if not n.startswith('__')]:\n"
        "        _ns[_name] = getattr(_mod, _name)\n"
        "del _name, _mod, _mod_name, _ns\n"
    )
    with open(SRC, "w") as fh:
        fh.write(facade)
    print("written: _core.py,", len(chunks), "family modules, facade queries.py")
    return 0


if __name__ == "__main__":
    sys.exit(main())
