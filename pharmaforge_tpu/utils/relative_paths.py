"""Repo-root-relative path resolution (reference utils/relative_paths.py)."""

from pathlib import Path

import pharmaforge_tpu


def fix_relative_path(path: str) -> str:
    """Make a filepath relative to the root of the repository."""
    root_dir = Path(pharmaforge_tpu.__file__).parent.parent
    return str(root_dir / path)
