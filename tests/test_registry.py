"""Registry loading semantics: load_all's missing-module tolerance must
cover a module whose PARENT package hasn't landed yet (milestone
builds), while a typo'd import INSIDE a present module still re-raises
(the round-8 review bug class: swallowing it silently drops every
registration in that module)."""

from __future__ import annotations

import sys
import textwrap

import pytest

from kinesis_datastore_app_spark import registry


@pytest.fixture
def tmp_pkg(tmp_path, monkeypatch):
    pkg = tmp_path / "kdas_t10_pkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "mod_typo.py").write_text(
        textwrap.dedent(
            """
            import kdas_t10_pkg.missing_sibling  # noqa: F401 — deliberate
            """
        )
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    yield "kdas_t10_pkg"
    for name in [m for m in sys.modules if m.startswith("kdas_t10_pkg")]:
        del sys.modules[name]


def _load_with(monkeypatch, modules):
    monkeypatch.setattr(registry, "_MODULES", modules)
    monkeypatch.setattr(registry, "_loaded", False)
    try:
        registry.load_all()
    finally:
        # the real registry was fully loaded before this test; leave the
        # flag true so later callers don't re-import with our patch gone
        registry._loaded = True


def test_missing_parent_package_is_tolerated(tmp_pkg, monkeypatch):
    # importing a.b.c when a.b does not exist raises with e.name='a.b' —
    # an ancestor of the requested module, not the module itself
    _load_with(monkeypatch, [f"{tmp_pkg}.not_yet.queries"])


def test_missing_leaf_module_is_tolerated(tmp_pkg, monkeypatch):
    _load_with(monkeypatch, [f"{tmp_pkg}.not_yet_leaf"])


def test_typoed_import_inside_present_module_reraises(tmp_pkg, monkeypatch):
    with pytest.raises(ModuleNotFoundError, match="missing_sibling"):
        _load_with(monkeypatch, [f"{tmp_pkg}.mod_typo"])


def test_skipped_modules_are_recorded_and_empty_for_real_registry(
    tmp_pkg, monkeypatch, capsys
):
    """Round-11 ADVICE (low): the missing-module tolerance also swallows
    a typo'd package segment in _MODULES, silently dropping every
    registration from that module. Skips are now recorded in
    SKIPPED_MODULES (with a stderr warning) — and for the REAL module
    list, which is fully landed, the skip list must be empty."""
    real_modules = registry._MODULES
    monkeypatch.setattr(registry, "SKIPPED_MODULES", [])
    _load_with(monkeypatch, [f"{tmp_pkg}.not_yet.queries"])
    assert registry.SKIPPED_MODULES == [f"{tmp_pkg}.not_yet.queries"]
    assert "skipped unimportable module" in capsys.readouterr().err

    # the shipped registry: every module in _MODULES imports — any skip
    # here is a typo, not a not-yet-landed milestone
    monkeypatch.setattr(registry, "_MODULES", real_modules)
    monkeypatch.setattr(registry, "SKIPPED_MODULES", [])
    monkeypatch.setattr(registry, "_loaded", False)
    try:
        registry.load_all()
    finally:
        registry._loaded = True
    assert registry.SKIPPED_MODULES == []
