"""The checked-in API reference must match the live public surface."""
import os
import sys


def test_api_reference_is_current():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "docs"))
    try:
        import gen_api_docs
    finally:
        sys.path.pop(0)
    generated = gen_api_docs.generate()
    with open(os.path.join(repo, "docs", "api_reference.md")) as f:
        checked_in = f.read()
    assert generated == checked_in, (
        "docs/api_reference.md is stale — regenerate with "
        "`python docs/gen_api_docs.py`")
