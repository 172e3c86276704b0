"""Repository paths (reference: coolchic/utils/paths.py)."""

from pathlib import Path

COOLCHIC_REPO_ROOT = Path(__file__).resolve().parents[2]
PRESET_CFG_DIR = COOLCHIC_REPO_ROOT / "preset_cfg"
RESULTS_DIR = COOLCHIC_REPO_ROOT / "results"
