"""Packaging hygiene (round 5): pyproject metadata, the explicit public
API at the package root, and an editable-install round-trip.

The image has no `wheel` package and setuptools 65, so PEP 660
editable installs (pip install -e .) cannot build here; the legacy
``setup.py develop --prefix`` path IS available and proves the same
contract — the project installs as a first-class library and imports
from outside the repo."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_pyproject_metadata_is_pinned():
    import tomllib

    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        meta = tomllib.load(fh)
    proj = meta["project"]
    assert proj["name"] == "kinesis-producer-spark"
    deps = {d.split(">=")[0].split("<")[0]: d for d in proj["dependencies"]}
    assert "pyspark" in deps and "<5" in deps["pyspark"], "pyspark must be range-pinned"
    for need in ("pandas", "numpy", "pyarrow"):
        assert need in deps
    dev = proj["optional-dependencies"]["dev"]
    assert any(d.startswith("duckdb") and "<2" in d for d in dev)
    import kinesis_producer_spark as k

    assert k.__version__ == proj["version"]


def test_public_api_resolves():
    import kinesis_producer_spark as k

    assert len(k.__all__) > 15
    for name in k.__all__:
        obj = getattr(k, name)
        assert callable(obj) or isinstance(obj, type), name
    with pytest.raises(AttributeError, match="no attribute"):
        k.not_a_thing  # noqa: B018
    # the flagship names are present by contract
    for name in ("get_spark", "KinesisSink", "decode_media", "lsh_candidate_pairs"):
        assert name in k.__all__


def test_editable_install_roundtrip(tmp_path):
    """setup.py develop into a scratch prefix, then import the package
    from OUTSIDE the repo through the installed .pth — the
    library-not-a-script contract."""
    pyver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    sp = tmp_path / "prefix" / "lib" / pyver / "site-packages"
    sp.mkdir(parents=True)
    env = dict(os.environ, PYTHONPATH=str(sp))
    r = subprocess.run(
        [sys.executable, "setup.py", "develop", "--prefix", str(tmp_path / "prefix")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    if r.returncode != 0 and "bdist_wheel" in r.stdout + r.stderr:
        pytest.skip("environment cannot build wheels (no `wheel` package)")
    assert r.returncode == 0, r.stdout + r.stderr
    assert (sp / "kinesis-producer-spark.egg-link").exists()
    check = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                "import site, sys; "
                f"site.addsitedir({str(sp)!r}); "
                "import kinesis_producer_spark as k; "
                "assert k.KinesisSink and k.get_spark; "
                "print(k.__version__)"
            ),
        ],
        cwd=str(tmp_path),  # NOT the repo — the .pth must supply the path
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert check.returncode == 0, check.stdout + check.stderr
    assert check.stdout.strip() == "0.1.0"
