"""Ray-Data ER pipeline stages: transcripts → docs → blocks → pairs →
scores → edges → clusters, with checkpoint/resume and pairwise-F1 metrics."""

from .config import PipelineConfig  # noqa: F401
from .run import run_er_pipeline  # noqa: F401
