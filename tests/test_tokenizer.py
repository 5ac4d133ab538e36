"""SimpleTokenizer hardening tests (reference:
/root/reference/models/text_encoder/tokenizer.py:140-146).

1. An explicit tokenizer path that fails to load must raise (no silent hash
   fallback producing garbage masks).
2. The hermetic hash fallback must be deterministic across processes
   regardless of PYTHONHASHSEED.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from ocpg_tpu.models.text_encoder import SimpleTokenizer

CAPTIONS = ["a red bird flying over water", "the dog on the left"]


def test_bad_tokenizer_path_raises(tmp_path):
    with pytest.raises(Exception) as ei:
        SimpleTokenizer(str(tmp_path / "definitely_missing_tokenizer"))
    assert "definitely_missing_tokenizer" in str(ei.value)


def _subprocess_ids(hashseed: str) -> np.ndarray:
    code = (
        "import numpy as np\n"
        "from ocpg_tpu.models.text_encoder import SimpleTokenizer\n"
        f"ids, mask = SimpleTokenizer(max_len=16)({CAPTIONS!r})\n"
        "print(ids.tolist())\n"
    )
    env = dict(os.environ, PYTHONHASHSEED=hashseed,
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, check=True)
    return np.asarray(eval(out.stdout.strip()))


def test_hash_fallback_stable_across_processes():
    a = _subprocess_ids("0")
    b = _subprocess_ids("12345")
    ids, _ = SimpleTokenizer(max_len=16)(CAPTIONS)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, ids)
    # sanity: <s>=0, </s>=2, pad=1, word ids >= 4
    assert ids[0, 0] == 0 and 2 in ids[0]
    assert (ids[ids > 2] >= 4).all()
