"""Prose-vs-artifact consistency (VERDICT r3 item 8): every
artifact-backed table in README.md must match a fresh render from its
source JSON (benchmarks/check_evidence.py). Run `--fix` to regenerate
after updating an artifact."""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_tables_match_artifacts():
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    import check_evidence
    problems = []
    for doc in check_evidence.DOCS:
        path = os.path.join(ROOT, doc)
        if os.path.exists(path):
            problems += check_evidence.process(path, fix=False)
    assert not problems, "\n".join(problems)
