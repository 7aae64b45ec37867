"""Path resolution for scene assets.

Scene TOMLs reference assets by repo-relative paths ("data/curves/...").
Resolution walks a search-path list so the shipped reference data
(read-only at /root/reference) and this repo's own data/ overlay both work.
"""

from __future__ import annotations

import os
from typing import List, Optional

DEFAULT_SEARCH_PATHS = [".", "/root/repo", "/root/reference"]


def resolve(path: str, search_paths: Optional[List[str]] = None) -> str:
    if os.path.isabs(path) and os.path.exists(path):
        return path
    for root in search_paths or DEFAULT_SEARCH_PATHS:
        cand = os.path.join(root, path)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"asset not found on search paths: {path}")
