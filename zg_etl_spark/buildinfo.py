"""Build-round counter for the per-round fuzz ritual (SURVEY.md §5).

Bumped at the START of each build round. tests/test_deep_sweep.py
derives its random-tree seed from it, so every round sweeps FRESH trees
instead of re-running the same corpus: the round-8 one-off sweeps
(~2,600 trees at then-fresh seeds) found three real emitter bugs the
committed 120-tree corpus had missed (the now()-rendering bug and both
>2^53 ulp-amplification divergences). Divergences a sweep finds get
fixed or documented, then pinned as named corpus tests — the sweep
itself never becomes the regression armor, it keeps re-arming it.
"""

BUILD_ROUND = 11
