"""Regenerate the golden parity-mode challenge stream in tests/test_parity.py.

Run after any intentional transcript change (e.g. poseidon.set_params with
the reference fork's constants) and commit the new values with the change.
"""

import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_parity import _golden_stream  # noqa: E402

stream = _golden_stream()
path = os.path.join(REPO, "tests", "test_parity.py")
src = open(path).read()
src = re.sub(
    r"GOLDEN_PARITY_STREAM = .*?(?=\n\n)",
    f"GOLDEN_PARITY_STREAM = {tuple(int(x) for x in stream)!r}",
    src,
    count=1,
    flags=re.S,
)
open(path, "w").write(src)
print("golden stream:", stream)
