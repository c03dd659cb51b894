"""Offline data-prep tools (reference ``data/scripts/``): audio extraction,
frame extraction, TV-L1 optical flow, manifest post-processing, demo video
assembly.  Host-side, off the training path."""
