"""Source-hygiene pins.

Round-9 verdict 'what's wrong' #1: a non-raw `'\\s'` inside the
bpe_tokenizer_encode oracle emitted the suite's single
DeprecationWarning (invalid escape sequence) — harmless today, a
SyntaxError in a future Python. The fix made the literal raw; this
test makes the whole class structural: every package source must
COMPILE with escape/syntax warnings promoted to errors (compile-time
warnings like invalid escapes are only raised when the source is
actually compiled, so the cached .pyc import path cannot stand in for
this check).
"""

from __future__ import annotations

import os
import warnings

import api_kakfa_spark_airflow_s3_athena_spark as pkg


def _package_sources():
    root = os.path.dirname(pkg.__file__)
    for dirpath, _dirnames, filenames in os.walk(root):
        for fname in filenames:
            if fname.endswith(".py"):
                yield os.path.join(dirpath, fname)


def test_no_invalid_escape_sequences_in_package():
    paths = list(_package_sources())
    assert len(paths) > 20, "package source walk came back implausibly small"
    for path in paths:
        with open(path, encoding="utf-8") as fh:
            src = fh.read()
        with warnings.catch_warnings():
            warnings.simplefilter("error", SyntaxWarning)
            warnings.simplefilter("error", DeprecationWarning)
            compile(src, path, "exec")
