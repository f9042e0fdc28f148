"""Scratch-directory derivation for operators that spill through disk.

Keyed by the dataset's ABSOLUTE path (short sha1), never just its
basename: two datasets that merely share a directory name must not
rmtree each other's live spills / checkpoints / scratch lakes.
Concurrent calls on the SAME dataset still share a root — the bench and
test flows are sequential; revisit before parallelizing those.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path


def scratch_dir(tag: str, sf_dir: str | os.PathLike) -> Path:
    key = hashlib.sha1(os.path.abspath(str(sf_dir)).encode()).hexdigest()[:8]
    return (Path(os.environ.get("GRAFT_TMP", "/tmp")) / "rfb_cnpj_etl_ray"
            / tag / f"{Path(str(sf_dir)).name}-{key}")
