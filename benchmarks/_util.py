"""Shared helpers for the benchmark scripts."""
import importlib.util
import os


def load_reference_baseline():
    """Load benchmarks/reference_baseline.py as a module (it compiles and
    binds the unmodified reference C core); one definition instead of a
    copy-pasted importlib block per benchmark."""
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "reference_baseline", os.path.join(here, "reference_baseline.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
