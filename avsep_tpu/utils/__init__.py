"""avsep_tpu.utils — meters, media IO, visualization."""

from avsep_tpu.utils.meters import AverageMeter, new_history  # noqa: F401
from avsep_tpu.utils.media import (  # noqa: F401
    VideoWriter, combine_video_audio, magnitude2heatmap, makedirs,
    save_video)
