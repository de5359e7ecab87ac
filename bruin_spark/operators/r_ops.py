"""R assets: run an asset's R script through Rscript with the BRUIN_*
env contract.

Mirrors the reference's local R operator (pkg/r/operator.go:50-73
Rscript discovery + install hint, runner.go:46-75 direct-vs-renv run):
the script runs as a subprocess with the same BRUIN_* context Python
assets get; when an ``renv.lock`` sits next to the script (or in an
ancestor directory) the process runs with that directory as cwd so
renv's project autoloader activates the pinned library.

Rscript is not bundled here; a missing executable raises the same
actionable message the reference prints rather than a bare FileNotFound.
"""

from __future__ import annotations

import os
import shutil
import subprocess

from bruin_spark.model.pipeline import Asset
from bruin_spark.render.jinja import RenderContext

_INSTALL_HINT = (
    "R is not installed or not in PATH. Install R from https://www.r-project.org/ "
    "and make sure 'Rscript' is available in your PATH."
)


class RNotInstalledError(RuntimeError):
    pass


def find_rscript() -> str:
    path = shutil.which("Rscript")
    if path is None:
        raise RNotInstalledError(_INSTALL_HINT)
    return path


def find_renv_lock(script_path: str, stop_dir: str | None = None) -> str | None:
    """Nearest renv.lock walking up from the script's directory
    (ref: pkg/r/path.go FindRenvLockInPath)."""
    d = os.path.dirname(os.path.abspath(script_path))
    stop = os.path.abspath(stop_dir) if stop_dir else None
    while True:
        cand = os.path.join(d, "renv.lock")
        if os.path.isfile(cand):
            return cand
        if d == stop or os.path.dirname(d) == d:
            return None
        d = os.path.dirname(d)


def run_r_asset(
    spark,
    asset: Asset,
    ctx: RenderContext | None = None,
    timeout_s: float | None = None,
) -> str:
    """Execute the asset's R file; returns captured stdout.

    The script talks to the warehouse itself (like the reference's R
    assets); Spark-side materialization is not implied.
    """
    script = asset.file_path
    if not script or not os.path.isfile(script):
        raise FileNotFoundError(f"R asset {asset.name} has no executable file: {script!r}")
    rscript = find_rscript()

    from bruin_spark.operators.assets_ops import _context_env

    env = dict(os.environ)
    env.update(_context_env(asset, ctx))
    env["BRUIN_ASSET"] = asset.name

    lock = find_renv_lock(script)
    cwd = os.path.dirname(lock) if lock else os.path.dirname(os.path.abspath(script))
    proc = subprocess.run(  # noqa: S603 - asset scripts are repo code, same trust as `bruin run`
        [rscript, os.path.abspath(script)],
        env=env,
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=timeout_s,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"R asset {asset.name} failed (exit {proc.returncode}):\n{proc.stderr.strip()}"
        )
    return proc.stdout
