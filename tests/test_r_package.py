"""Consistency checks for the R bindings (r/stochqn.tpu).

This image has no R toolchain, so the package cannot be installed here;
these tests pin everything that CAN be checked without R:

  * the vendored core header is byte-identical to native/include's
    (the R package compiles the same engine the Python ctypes backend
    loads — drift would silently fork the semantics);
  * every ``.Call`` site in the R sources names a routine registered in
    rwrapper.cpp's R_CallMethodDef table, with a matching argument count;
  * every NAMESPACE export is a function actually defined in R/;
  * rwrapper.cpp compiles (-fsyntax-only) against stub R headers
    (tests/r_api_stub) — catches type errors without an R install;
  * when ``Rscript`` IS on PATH, the full R test battery
    (r/stochqn.tpu/tests/run_tests.R) builds and runs for real.
"""
import os
import re
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RPKG = os.path.join(REPO, "r", "stochqn.tpu")
WRAPPER = os.path.join(RPKG, "src", "rwrapper.cpp")


def _read(path):
    with open(path, "r") as f:
        return f.read()


def _r_sources():
    rdir = os.path.join(RPKG, "R")
    return {f: _read(os.path.join(rdir, f)) for f in sorted(os.listdir(rdir))
            if f.endswith(".R")}


def test_vendored_header_is_synced():
    ours = _read(os.path.join(REPO, "native", "include",
                              "stochqn_native.hpp"))
    theirs = _read(os.path.join(RPKG, "src", "stochqn_native.hpp"))
    assert ours == theirs, (
        "r/stochqn.tpu/src/stochqn_native.hpp has drifted from "
        "native/include/stochqn_native.hpp — re-sync with "
        "`cp native/include/stochqn_native.hpp r/stochqn.tpu/src/`")


def _registered_routines():
    """Parse rwrapper.cpp's R_CallMethodDef table -> {name: numArgs}."""
    src = _read(WRAPPER)
    table = re.search(
        r"R_CallMethodDef\s+CallEntries\[\]\s*=\s*\{(.*?)\{NULL",
        src, re.S)
    assert table, "R_CallMethodDef table not found in rwrapper.cpp"
    out = {}
    for name, fn, nargs in re.findall(
            r'\{"(\w+)",\s*\(DL_FUNC\)&(\w+),\s*(\d+)\}', table.group(1)):
        assert name == fn, f"registration name {name} != function {fn}"
        out[name] = int(nargs)
    return out


def _call_sites():
    """Find every .Call(C_xxx, ...) in the R sources -> [(name, argc)]."""
    sites = []
    for fname, src in _r_sources().items():
        for m in re.finditer(r"\.Call\((C_\w+)", src):
            # count top-level commas from the opening paren
            i = m.start() + len(".Call(")
            depth, argc = 1, 1
            while depth > 0:
                c = src[i]
                if c in "([":
                    depth += 1
                elif c in ")]":
                    depth -= 1
                elif c == "," and depth == 1:
                    argc += 1
                i += 1
            # first arg is the routine symbol itself
            sites.append((fname, m.group(1), argc - 1))
    return sites


def test_call_sites_match_registration():
    registered = _registered_routines()
    sites = _call_sites()
    assert sites, "no .Call sites found in R sources"
    for fname, name, argc in sites:
        assert name in registered, f"{fname}: .Call to unregistered {name}"
        assert argc == registered[name], (
            f"{fname}: .Call({name}, ...) passes {argc} args, "
            f"registration says {registered[name]}")
    used = {name for _, name, _ in sites}
    assert {"C_olbfgs_create", "C_sqn_create", "C_adaqn_create",
            "C_olbfgs_run", "C_sqn_run", "C_adaqn_run"} <= used


def test_namespace_exports_are_defined():
    ns = _read(os.path.join(RPKG, "NAMESPACE"))
    exports = re.findall(r"^export\((\w+)\)", ns, re.M)
    s3 = re.findall(r"^S3method\((\w+),\s*([\w.]+)\)", ns, re.M)
    defined = set()
    for src in _r_sources().values():
        defined |= set(re.findall(
            r"^([\w.]+)\s*<-\s*function", src, re.M))
    for name in exports:
        assert name in defined, f"NAMESPACE exports undefined '{name}'"
    for generic, cls in s3:
        assert f"{generic}.{cls}" in defined, (
            f"NAMESPACE S3method({generic}, {cls}) has no "
            f"{generic}.{cls} definition")
    assert ".registration = TRUE" in ns


def test_every_export_is_documented():
    """R CMD check requires an Rd \\alias for every exported symbol; the
    reference ships 26 roxygen-generated Rd files (/root/reference/man/).
    This package's man/ pages are hand-written — keep them complete."""
    man = os.path.join(RPKG, "man")
    rds = {f: _read(os.path.join(man, f)) for f in sorted(os.listdir(man))
           if f.endswith(".Rd")}
    assert len(rds) >= 10, "man/ is missing"
    aliases = set()
    for fname, src in rds.items():
        assert re.search(r"\\name\{", src), f"{fname}: no \\name"
        assert re.search(r"\\title\{", src), f"{fname}: no \\title"
        assert re.search(r"\\description\{", src), f"{fname}: no \\description"
        aliases |= set(re.findall(r"\\alias\{([^}]+)\}", src))
    ns = _read(os.path.join(RPKG, "NAMESPACE"))
    exports = re.findall(r"^export\((\w+)\)", ns, re.M)
    for name in exports:
        assert name in aliases, f"export '{name}' has no man/*.Rd alias"
    # documented usage must name real functions with matching signatures:
    # every \usage function call must be a defined R function
    defined = set()
    for src in _r_sources().values():
        defined |= set(re.findall(r"^([\w.]+)\s*<-\s*function", src, re.M))
    for fname, src in rds.items():
        for m in re.finditer(r"^(\w[\w.]*)\(", _strip_usage(src), re.M):
            assert m.group(1) in defined or m.group(1) in (
                "predict", "coef", "print", "summary"), (
                f"{fname}: \\usage documents unknown function "
                f"{m.group(1)}")


def _strip_usage(rd_src):
    m = re.search(r"\\usage\{(.*?)\n\}", rd_src, re.S)
    return m.group(1) if m else ""


def test_formula_interface_source_checks():
    """The formula path (reference R/logistic.R:120-210,333-435) must keep
    its load-bearing pieces: pos_class validation, first-batch factor
    pinning, target-column derivation, and the delete.response predict
    path for data without the target column."""
    src = _read(os.path.join(RPKG, "R", "logistic.R"))
    for needle in ("pos_class", "pin.factor.levels", "chars.to.factors",
                   "model.matrix", "delete.response", "factor_levs",
                   "neg_class", "all.vars"):
        assert needle in src, f"formula interface lost '{needle}'"
    # formula battery exists
    battery = _read(os.path.join(RPKG, "tests", "run_tests.R"))
    assert "formula adaQN accuracy" in battery


def test_wrapper_compiles_against_stub_headers():
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no g++")
    stub = os.path.join(REPO, "tests", "r_api_stub")
    cmd = [gxx, "-fsyntax-only", "-std=c++17", "-Wall", "-Werror",
           f"-I{stub}", f"-I{os.path.join(RPKG, 'src')}", WRAPPER]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    assert proc.returncode == 0, (
        "rwrapper.cpp failed to compile against the stub R API:\n"
        + proc.stderr[-4000:])


def test_r_battery_runs_when_r_is_available():
    rscript = shutil.which("Rscript")
    rcmd = shutil.which("R")
    if rscript is None or rcmd is None:
        pytest.skip("no R toolchain in this image")
    lib = os.path.join(RPKG, ".test_rlib")
    os.makedirs(lib, exist_ok=True)
    proc = subprocess.run([rcmd, "CMD", "INSTALL", f"--library={lib}", RPKG],
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    env = dict(os.environ, R_LIBS_USER=lib, R_LIBS=lib)
    proc = subprocess.run(
        [rscript, os.path.join(RPKG, "tests", "run_tests.R")],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    assert "all R binding tests passed" in proc.stdout
