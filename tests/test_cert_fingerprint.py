"""The automatic cert-staleness key (tools/cert_fingerprint.py).

What the fingerprint must guarantee (ADVICE.md r6, medium):
  * editing a helper an existing query's plan flows through CHANGES the
    query's fingerprint (never under-rotate — the r6 failure mode);
  * appending an unrelated new query to the same module does NOT change
    existing fingerprints (module-level hashing over-rotated 129/179);
  * editing the oracle SQL alone changes the fingerprint;
  * the computation is deterministic.

The slicer is exercised on a synthetic package (PKG monkeypatched) so
the assertions stay meaningful as the real package grows.
"""

from __future__ import annotations

import json
import os
import textwrap

import pytest

import tools.cert_fingerprint as cf


def _write_pkg(root, helper_body="return x + 1", extra="", oracle="SELECT 1"):
    pkg = os.path.join(root, "fakepkg")
    os.makedirs(os.path.join(pkg, "plans"), exist_ok=True)
    os.makedirs(os.path.join(pkg, "ops"), exist_ok=True)
    open(os.path.join(pkg, "__init__.py"), "w").write("")
    open(os.path.join(pkg, "plans", "__init__.py"), "w").write("")
    open(os.path.join(pkg, "ops", "__init__.py"), "w").write("")
    with open(os.path.join(pkg, "ops", "helper.py"), "w") as fh:
        fh.write(
            textwrap.dedent(
                f"""
                def bump(x):
                    {helper_body}

                def unrelated(x):
                    return x * 2
                """
            )
        )
    with open(os.path.join(pkg, "plans", "queries.py"), "w") as fh:
        fh.write(
            textwrap.dedent(
                f"""
                from fakepkg.ops.helper import bump

                _CONST = 7
                _ORACLE_A = {oracle!r}

                def q_a(spark, sf):
                    return bump(_CONST)

                def q_b(spark, sf):
                    return 42
                """
            )
            + extra
        )
    return pkg


@pytest.fixture
def fake_root(tmp_path, monkeypatch):
    monkeypatch.setattr(cf, "PKG", "fakepkg")
    return str(tmp_path)


def _fp(root, mod, name, oracle=""):
    import hashlib

    s = cf._Slicer(root)
    contrib = s.slice(mod, name)
    h = hashlib.sha256()
    h.update(oracle.encode() + b"\0")
    for c in sorted(contrib):
        h.update(c.encode() + b"\0")
    return h.hexdigest(), contrib


def test_deterministic(fake_root):
    _write_pkg(fake_root)
    a1, _ = _fp(fake_root, "fakepkg.plans.queries", "q_a")
    a2, _ = _fp(fake_root, "fakepkg.plans.queries", "q_a")
    assert a1 == a2


def test_helper_edit_changes_dependent_only(fake_root):
    _write_pkg(fake_root)
    a0, _ = _fp(fake_root, "fakepkg.plans.queries", "q_a")
    b0, _ = _fp(fake_root, "fakepkg.plans.queries", "q_b")
    _write_pkg(fake_root, helper_body="return x + 2")
    a1, _ = _fp(fake_root, "fakepkg.plans.queries", "q_a")
    b1, _ = _fp(fake_root, "fakepkg.plans.queries", "q_b")
    assert a0 != a1, "q_a's plan flows through bump() — must de-certify"
    assert b0 == b1, "q_b never touches the helper — must stay certified"


def test_sibling_append_is_invisible(fake_root):
    _write_pkg(fake_root)
    a0, _ = _fp(fake_root, "fakepkg.plans.queries", "q_a")
    _write_pkg(fake_root, extra="\ndef q_new(spark, sf):\n    return 1\n")
    a1, _ = _fp(fake_root, "fakepkg.plans.queries", "q_a")
    assert a0 == a1, "appending a new query must not rotate its siblings"


def test_function_local_import_traced(fake_root):
    """A deferred import inside the query function body (`def q: from
    fakepkg.ops import helper as H`) must contribute the imported
    module — the wave modules' standard style. Before the r7 fix these
    names were unknown to the slicer and operator edits routed through
    them never de-certified anything (embedding_kmeans missed the whole
    similarity module)."""
    _write_pkg(
        fake_root,
        extra=textwrap.dedent(
            """
            def q_local(spark, sf):
                from fakepkg.ops import helper as H
                return H.bump(3)
            """
        ),
    )
    l0, contrib = _fp(fake_root, "fakepkg.plans.queries", "q_local")
    assert any("helper" in c for c in contrib), contrib
    _write_pkg(
        fake_root,
        helper_body="return x + 9",
        extra=textwrap.dedent(
            """
            def q_local(spark, sf):
                from fakepkg.ops import helper as H
                return H.bump(3)
            """
        ),
    )
    l1, _ = _fp(fake_root, "fakepkg.plans.queries", "q_local")
    assert l0 != l1, "edit behind a function-local import must de-certify"


def test_oracle_change_changes_fp(fake_root):
    _write_pkg(fake_root)
    a0, _ = _fp(fake_root, "fakepkg.plans.queries", "q_a", oracle="SELECT 1")
    a1, _ = _fp(fake_root, "fakepkg.plans.queries", "q_a", oracle="SELECT 2")
    assert a0 != a1


def test_referenced_constant_sliced_in(fake_root):
    _write_pkg(fake_root)
    _, contrib = _fp(fake_root, "fakepkg.plans.queries", "q_a")
    assert any("_CONST" in c for c in contrib), contrib
    assert any("helper" in c for c in contrib), contrib


def test_real_registry_fingerprints():
    """Every registered query fingerprints without error, and the store
    (when present) refers only to real queries."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fps = cf.compute_fingerprints(repo)
    assert len(fps) >= 179
    assert all(len(v) == 64 for v in fps.values())
    store_path = os.path.join(repo, "CERT_FINGERPRINTS.json")
    if os.path.exists(store_path):
        store = json.load(open(store_path))
        unknown = set(store) - set(fps)
        assert not unknown, f"store entries for unregistered queries: {unknown}"


def test_entry_ordering_puts_stale_first():
    """queries() must surface never-certified and fingerprint-stale
    queries inside the driver's certification prefix."""
    import importlib
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    try:
        entry = importlib.import_module("__spark_entry__")
        names = list(entry.queries())
        assert len(names) == len(set(names))
        # FORCE_RECERT members lead the queue
        for q in entry.FORCE_RECERT:
            assert names.index(q) < 50, (q, names.index(q))
    finally:
        sys.path.remove(repo)
