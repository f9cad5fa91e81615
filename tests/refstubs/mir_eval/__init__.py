"""mir_eval stub for importing the reference implementation in tests.

The reference imports mir_eval names at module level
(``/root/reference/amt_tools/evaluate.py:8-12``, ``tools/io.py:7``). The
differential suite compares conversion/model layers, not mir_eval's metric
math (the rebuild carries its own implementation in
``amt_tools_tpu/metrics.py``, independently tested), so every entry point
fails loudly if reached.
"""

from . import multipitch, transcription, util  # noqa: F401
