"""Packaging contract (reference ships an installable wheel,
/root/reference/pyproject.toml:23-33 + setup.py; ours is a pure-Python
setuptools package — `pip install -e .` was exercised in-sandbox and the
console scripts resolve on PATH).

These tests pin the parts that make the wheel installable without running
pip: the pyproject parses, the version is importable (setuptools reads it
via `attr:`), and every declared console-script target is an importable
callable.
"""

import importlib
import pathlib
import sys

if sys.version_info >= (3, 11):
    import tomllib
else:  # pragma: no cover
    tomllib = None

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _load_pyproject():
    if tomllib is None:
        import pytest

        pytest.skip("tomllib needs py3.11")
    return tomllib.loads((ROOT / "pyproject.toml").read_text())


def test_pyproject_parses_and_version_attr_resolves():
    cfg = _load_pyproject()
    assert cfg["project"]["name"] == "nunchaku-tpu"
    attr = cfg["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    mod_name, _, attr_name = attr.rpartition(".")
    mod = importlib.import_module(mod_name)
    version = getattr(mod, attr_name)
    assert isinstance(version, str) and version.count(".") >= 1


def test_console_script_targets_are_callables():
    cfg = _load_pyproject()
    scripts = cfg["project"]["scripts"]
    assert "nunchaku-tpu-merge-safetensors" in scripts
    for name, target in scripts.items():
        mod_name, _, fn_name = target.partition(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, fn_name)), (name, target)


def test_package_discovery_excludes_tests():
    cfg = _load_pyproject()
    include = cfg["tool"]["setuptools"]["packages"]["find"]["include"]
    assert include == ["nunchaku_tpu*"]
