"""`pw.ml.hmm` — reference `stdlib/ml/hmm.py` (create_hmm_reducer).
Implementation in `stdlib/ml.py` (Viterbi fold as an Arrow-batched
custom reducer); this module provides the reference import path.
"""

from __future__ import annotations

from ..stdlib.ml import create_hmm_reducer

__all__ = ["create_hmm_reducer"]
