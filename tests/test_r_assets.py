"""R asset operator (ref pkg/r/operator.go, runner.go, path.go):
Rscript discovery with the actionable install hint, renv.lock lookup,
and the subprocess run with the BRUIN_* env contract — driven through a
fake Rscript executable so no R installation is needed."""

import os
import stat

import pytest

from bruin_spark.model.pipeline import Asset
from bruin_spark.operators.r_ops import (
    RNotInstalledError,
    find_renv_lock,
    find_rscript,
    run_r_asset,
)
from bruin_spark.render.jinja import RenderContext


def _fake_rscript(tmp_path, body: str) -> str:
    p = tmp_path / "bin" / "Rscript"
    p.parent.mkdir(exist_ok=True)
    p.write_text("#!/bin/sh\n" + body)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p.parent)


def test_missing_rscript_raises_install_hint(monkeypatch):
    monkeypatch.setattr("shutil.which", lambda _name: None)
    with pytest.raises(RNotInstalledError, match="Rscript.*PATH"):
        find_rscript()


def test_find_renv_lock_walks_up(tmp_path):
    (tmp_path / "proj" / "assets").mkdir(parents=True)
    (tmp_path / "proj" / "renv.lock").write_text("{}")
    script = tmp_path / "proj" / "assets" / "a.R"
    script.write_text("cat('hi')")
    assert find_renv_lock(str(script)) == str(tmp_path / "proj" / "renv.lock")
    assert find_renv_lock(str(tmp_path / "elsewhere.R")) is None


def test_run_r_asset_env_and_output(tmp_path, monkeypatch):
    from datetime import datetime

    bindir = _fake_rscript(
        tmp_path, 'echo "asset=$BRUIN_ASSET pipeline=$BRUIN_PIPELINE arg=$1"\n'
    )
    monkeypatch.setenv("PATH", bindir + os.pathsep + os.environ["PATH"])
    script = tmp_path / "my_asset.R"
    script.write_text("# real R not needed; the fake Rscript echoes env\n")
    asset = Asset(name="r.report", type="r", file_path=str(script))
    ctx = RenderContext(
        start=datetime(2024, 1, 1), end=datetime(2024, 1, 2), pipeline_name="pp"
    )
    out = run_r_asset(None, asset, ctx)
    assert "asset=r.report" in out
    assert "pipeline=pp" in out
    assert str(script) in out or "arg=" in out


def test_run_r_asset_failure_surfaces_stderr(tmp_path, monkeypatch):
    bindir = _fake_rscript(tmp_path, 'echo "boom" 1>&2; exit 3\n')
    monkeypatch.setenv("PATH", bindir + os.pathsep + os.environ["PATH"])
    script = tmp_path / "bad.R"
    script.write_text("x\n")
    asset = Asset(name="r.bad", type="r", file_path=str(script))
    with pytest.raises(RuntimeError, match="exit 3.*boom|boom"):
        run_r_asset(None, asset, None)


def test_run_r_asset_uses_renv_project_cwd(tmp_path, monkeypatch):
    bindir = _fake_rscript(tmp_path, "pwd\n")
    monkeypatch.setenv("PATH", bindir + os.pathsep + os.environ["PATH"])
    (tmp_path / "proj" / "assets").mkdir(parents=True)
    (tmp_path / "proj" / "renv.lock").write_text("{}")
    script = tmp_path / "proj" / "assets" / "a.R"
    script.write_text("#\n")
    asset = Asset(name="r.proj", type="r", file_path=str(script))
    out = run_r_asset(None, asset, None)
    assert out.strip().endswith(str(tmp_path / "proj"))
