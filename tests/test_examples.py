"""Every example script must import cleanly against the current package
API and wire a runnable argparse main.

The examples are the user surface the reference ships 51 scripts for
(/root/reference/examples/); full runs need real checkpoints, but API
drift (renamed loaders, removed kwargs) is caught by importing the module
(executes the `from nunchaku_tpu import ...` surface) and driving
``main()`` to the argparse exit.
"""

import importlib.util
import pathlib
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


def _load(path):
    spec = importlib.util.spec_from_file_location(f"example_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_imports_and_parses(path, monkeypatch, capsys):
    mod = _load(path)
    if not hasattr(mod, "main"):
        return  # library-style example (e.g. quickstart) ran at import
    monkeypatch.setattr(sys, "argv", [path.name, "--help"])
    try:
        mod.main()  # argparse-less mains (quickstart) just run to completion
    except SystemExit as e:
        assert e.code == 0, capsys.readouterr().err
