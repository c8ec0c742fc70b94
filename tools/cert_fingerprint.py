"""Per-query certification fingerprints — the automatic staleness key.

A driver hash_match=True record attests a (Spark plan, oracle SQL) PAIR
at the moment the driver ran it.  The hand-maintained FORCE_RECERT set
in __spark_entry__.py could not see plan edits (round 6 shipped edits
to six certified queries without rotating them).  This module replaces
that judgement call with a computable key:

    fp(query) = sha256( oracle SQL (or "<no-oracle>") + the query
                        function's PLAN-RELEVANT SOURCE SLICE )

where the slice is computed by AST name-resolution, not module hashing:

  * the query function's own source (decorators included — they carry
    the oracle and tag literals);
  * every top-level name it references, transitively, within its module
    (helper functions, SQL/constant assignments);
  * names imported ``from .other import helper`` are sliced in the
    exporting module the same way (recursively across the package);
  * a module-style import (``from ..operators import text as X``)
    contributes the WHOLE module file plus, recursively, the whole
    intra-package modules *it* imports — coarse on purpose: an operator
    edit must de-certify every query whose plan can flow through it;
  * imports are indexed wherever they appear, INCLUDING function-local
    deferred imports (``def q(...): from ..operators import similarity
    as S``) — the wave modules' standard import style; missing these
    silently exempted every ``S.``-routed operator edit (r7 fix, store
    re-seeded from the r1–r6 worktrees with the fixed slicer).

Module-level hashing alone is useless here: plans/registry.py imports
every wave module inside all_queries(), so a naive transitive closure
reaches ~the whole package and marked 129/179 queries stale at r6 HEAD.
Name slicing keeps the key tight (appending a new query to a wave file
does not rotate its siblings) while never under-rotating on operator
edits, which is the failure mode that buries a changed plan behind a
stale cert.

Round protocol (documented in docs/ROUND7.md):
  1. at round START, before editing anything, run
         python tools/cert_fingerprint.py update
     — the working tree still equals the code state the driver just
     certified, so queries passing in the newest CORRECTNESS_r*.json
     get their fingerprint recorded at exactly the attested state;
  2. edit freely; queries() in __spark_entry__.py de-certifies any
     query whose current fingerprint drifts from its record and rotates
     it into the driver's certification prefix.

CLI:
  python tools/cert_fingerprint.py print  [--root DIR]   # {name: fp}
  python tools/cert_fingerprint.py update [--root DIR]   # refresh CERT_FINGERPRINTS.json
  python tools/cert_fingerprint.py stale  [--root DIR]   # names needing re-cert
"""

from __future__ import annotations

import ast
import builtins
import hashlib
import json
import os
import sys

PKG = "map_v2_etl_spark"
_BUILTINS = frozenset(dir(builtins))


def _module_file(root: str, modname: str) -> str | None:
    rel = modname.split(".")
    base = os.path.join(root, *rel)
    if os.path.isfile(base + ".py"):
        return base + ".py"
    if os.path.isfile(os.path.join(base, "__init__.py")):
        return os.path.join(base, "__init__.py")
    return None


def _resolve_relative(modname: str, level: int, target: str | None) -> str:
    parts = modname.split(".")
    base = parts[: len(parts) - level]
    if target:
        base = base + target.split(".")
    return ".".join(base)


class _ModuleIndex:
    """Top-level name table of one module: definitions and imports."""

    def __init__(self, root: str, modname: str):
        self.modname = modname
        path = _module_file(root, modname)
        with open(path, "rb") as fh:
            data = fh.read()
        self.source = data.decode()
        self.file_sha = hashlib.sha256(data).hexdigest()
        self.tree = ast.parse(self.source)
        #: name -> defining top-level AST node
        self.defs: dict[str, ast.AST] = {}
        #: name -> ("module", fqmod) | ("name", fqmod, origname)
        self.imports: dict[str, tuple] = {}
        self.star_imports: list[str] = []
        for stmt in self._top_stmts(self.tree.body):
            self._index_stmt(stmt, root)
        # FUNCTION-LOCAL imports (r7 fix): wave modules routinely defer
        # operator imports into the query function body (`from
        # ..operators import similarity as S`) to keep import time low.
        # Indexing only top-level statements left those names unknown,
        # so e.g. embedding_kmeans' fingerprint silently missed the
        # whole similarity module — exactly the under-rotation this tool
        # exists to prevent.  Walk the full tree for the remaining
        # Import/ImportFrom nodes; top-level bindings win on collision
        # (setdefault), and over-inclusion only costs a spurious re-cert.
        top = set()
        for stmt in self._top_stmts(self.tree.body):
            top.add(id(stmt))
        for node in ast.walk(self.tree):
            if isinstance(node, (ast.Import, ast.ImportFrom)) and id(
                node
            ) not in top:
                self._index_stmt(node, root, nested=True)

    def _top_stmts(self, body):
        # walk into top-level try/except and `if` guards (import
        # fallbacks, TYPE_CHECKING blocks) but not into functions
        for stmt in body:
            yield stmt
            if isinstance(stmt, ast.Try):
                for blk in [stmt.body, stmt.orelse, stmt.finalbody] + [
                    h.body for h in stmt.handlers
                ]:
                    yield from self._top_stmts(blk)
            elif isinstance(stmt, ast.If):
                yield from self._top_stmts(stmt.body)
                yield from self._top_stmts(stmt.orelse)

    def _index_stmt(self, stmt, root, nested=False):
        if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            self.defs[stmt.name] = stmt
        elif isinstance(stmt, (ast.Assign, ast.AnnAssign, ast.AugAssign)):
            targets = stmt.targets if isinstance(stmt, ast.Assign) else [stmt.target]
            for t in targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        self.defs.setdefault(n.id, stmt)
        elif isinstance(stmt, ast.Import):
            for alias in stmt.names:
                bound = alias.asname or alias.name.split(".")[0]
                fq = alias.name if alias.asname else alias.name.split(".")[0]
                if fq.split(".")[0] == PKG:
                    if nested:
                        self.imports.setdefault(bound, ("module", fq))
                    else:
                        self.imports[bound] = ("module", fq)
        elif isinstance(stmt, ast.ImportFrom):
            base = (
                _resolve_relative(self.modname, stmt.level, stmt.module)
                if stmt.level
                else (stmt.module or "")
            )
            if base.split(".")[0] != PKG:
                return
            for alias in stmt.names:
                if alias.name == "*":
                    self.star_imports.append(base)
                    continue
                bound = alias.asname or alias.name
                sub = base + "." + alias.name
                if _module_file(root, sub) is not None:
                    spec = ("module", sub)
                else:
                    spec = ("name", base, alias.name)
                if nested:
                    self.imports.setdefault(bound, spec)
                else:
                    self.imports[bound] = spec

    def segment(self, node) -> str:
        parts = []
        for dec in getattr(node, "decorator_list", []) or []:
            parts.append(ast.get_source_segment(self.source, dec) or "")
        parts.append(ast.get_source_segment(self.source, node) or "")
        return "\n".join(parts)


class _Slicer:
    """Resolves (module, name) -> the set of hash contributions."""

    def __init__(self, root: str):
        self.root = root
        self._idx: dict[str, _ModuleIndex] = {}
        self._whole: dict[str, set[str]] = {}  # module -> whole-module closure

    def index(self, mod: str) -> _ModuleIndex:
        if mod not in self._idx:
            self._idx[mod] = _ModuleIndex(self.root, mod)
        return self._idx[mod]

    def whole_module(self, mod: str) -> set[str]:
        """Contributions for including a module wholesale: its file hash
        plus (recursively) every intra-package module it imports
        anywhere in the file — function-local imports included, they
        are exactly the lazy plan dependencies."""
        if mod in self._whole:
            return self._whole[mod]
        self._whole[mod] = set()  # cycle guard
        contrib = set()
        seen, stack = set(), [mod]
        while stack:
            m = stack.pop()
            if m in seen:
                continue
            seen.add(m)
            path = _module_file(self.root, m)
            if path is None:
                continue
            idx = self.index(m)
            contrib.add(f"mod:{m}:{idx.file_sha}")
            for node in ast.walk(idx.tree):
                if isinstance(node, ast.Import):
                    for a in node.names:
                        if a.name.split(".")[0] == PKG:
                            stack.append(a.name)
                elif isinstance(node, ast.ImportFrom):
                    base = (
                        _resolve_relative(m, node.level, node.module)
                        if node.level
                        else (node.module or "")
                    )
                    if base.split(".")[0] != PKG:
                        continue
                    stack.append(base)
                    for a in node.names:
                        if a.name != "*":
                            stack.append(base + "." + a.name)
        self._whole[mod] = contrib
        return contrib

    def slice(self, mod: str, name: str, _visited=None) -> set[str]:
        visited = _visited if _visited is not None else set()
        key = (mod, name)
        if key in visited:
            return set()
        visited.add(key)
        idx = self.index(mod)
        out: set[str] = set()
        if name in idx.imports:
            spec = idx.imports[name]
            if spec[0] == "module":
                out |= self.whole_module(spec[1])
            else:
                _, base, orig = spec
                if _module_file(self.root, base) is not None:
                    out |= self.slice(base, orig, visited)
                else:
                    out |= self.whole_module(base)
            return out
        if name in idx.defs:
            node = idx.defs[name]
            seg = idx.segment(node)
            out.add(
                f"def:{mod}:{name}:"
                + hashlib.sha256(seg.encode()).hexdigest()
            )
            refs = set()
            for sub in [node] + (getattr(node, "decorator_list", []) or []):
                for n in ast.walk(sub):
                    if isinstance(n, ast.Name):
                        refs.add(n.id)
            for r in sorted(refs):
                if r == name or r in _BUILTINS:
                    continue
                if r in idx.defs or r in idx.imports:
                    out |= self.slice(mod, r, visited)
                elif idx.star_imports:
                    for sm in idx.star_imports:
                        out |= self.whole_module(sm)
            return out
        # unknown: a star-imported name, or a local/attribute false
        # positive from ast.walk — include star modules, else ignore
        for sm in idx.star_imports:
            out |= self.whole_module(sm)
        return out


def compute_fingerprints(root: str) -> dict[str, str]:
    """{query name: fingerprint} for the registry at ``root``.

    Imports the package from ``root`` (pyspark must be importable; no
    SparkSession is created).  Run in a subprocess when fingerprinting
    a historical worktree, so module caches don't cross code states.
    """
    sys.path.insert(0, root)
    try:
        # only evict cached modules when they were loaded from a
        # DIFFERENT root (historical-worktree mode): evicting live
        # modules would re-populate a fresh REGISTRY behind the back of
        # callers (the driver's __spark_entry__) holding the old one
        loaded = sys.modules.get(PKG)
        if loaded is not None and not os.path.abspath(
            loaded.__file__
        ).startswith(os.path.abspath(root) + os.sep):
            for k in [k for k in sys.modules if k.split(".")[0] == PKG]:
                del sys.modules[k]
        from map_v2_etl_spark.plans import registry as r

        qs = r.all_queries()
        oracles = r.all_oracles()
        slicer = _Slicer(root)
        out = {}
        for name, fn in qs.items():
            mod, fname = fn.__module__, fn.__name__
            try:
                contrib = slicer.slice(mod, fname)
            except Exception:
                contrib = slicer.whole_module(mod)  # conservative fallback
            h = hashlib.sha256()
            h.update(oracles.get(name, "<no-oracle>").encode() + b"\0")
            for c in sorted(contrib):
                h.update(c.encode() + b"\0")
            out[name] = h.hexdigest()
        return out
    finally:
        sys.path.remove(root)


def _latest_passing(repo: str) -> tuple[int, set[str]]:
    """(round N, queries passing in CORRECTNESS_r{N}.json) for the
    newest snapshot; a pass is hash_match or a clean rows-only run."""
    import glob

    paths = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not paths:
        return 0, set()
    path = paths[-1]
    n = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
    with open(path) as fh:
        snap = json.load(fh)
    passing = set()
    for k, v in snap.items():
        if not isinstance(v, dict):
            continue
        if v.get("hash_match") is True or v.get("err") == "no_oracle":
            passing.add(k)
    return n, passing


def stale_queries(repo: str) -> set[str]:
    """Queries whose recorded fingerprint no longer matches the current
    code/oracle state (or that have no record at all)."""
    store_path = os.path.join(repo, "CERT_FINGERPRINTS.json")
    if not os.path.exists(store_path):
        return set(compute_fingerprints(repo))
    with open(store_path) as fh:
        store = json.load(fh)
    cur = compute_fingerprints(repo)
    return {
        q for q, fp in cur.items()
        if q not in store or store[q]["fp"] != fp
    }


def update(repo: str) -> None:
    """Record current fingerprints for queries passing in the newest
    CORRECTNESS snapshot.  ONLY valid at round start, before any edit —
    the working tree must equal the code state the driver certified."""
    store_path = os.path.join(repo, "CERT_FINGERPRINTS.json")
    store: dict = {}
    if os.path.exists(store_path):
        with open(store_path) as fh:
            store = json.load(fh)
    n, passing = _latest_passing(repo)
    fps = compute_fingerprints(repo)
    changed = 0
    for q in sorted(passing):
        if q not in fps:
            continue  # query renamed/removed since the snapshot
        rec = store.get(q)
        if rec is None or rec["fp"] != fps[q] or rec["round"] < n:
            store[q] = {"fp": fps[q], "round": n}
            changed += 1
    with open(store_path, "w") as fh:
        json.dump(store, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"round {n}: {len(passing)} passing, {changed} records updated, "
          f"{len(store)} total in {store_path}")


def main() -> None:
    args = sys.argv[1:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if "--root" in args:
        root = args[args.index("--root") + 1]
    cmd = args[0] if args else "print"
    if cmd == "print":
        print(json.dumps(compute_fingerprints(root), indent=1, sort_keys=True))
    elif cmd == "update":
        update(root)
    elif cmd == "stale":
        for q in sorted(stale_queries(root)):
            print(q)
    elif cmd == "stale-line":
        # Round-doc-ready provenance line: emitted by the tool, never typed
        # by hand (r14 "40", r15 "25", r16 "29" were all prose typos for the
        # actual stale counts — VERDICT r16 asked for this subcommand).
        import subprocess
        head = subprocess.run(
            ["git", "-C", root, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True).stdout.strip() or "?"
        print(f"Stale certs at {head}: **{len(stale_queries(root))}**")
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
