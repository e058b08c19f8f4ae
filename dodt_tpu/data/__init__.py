"""Host-side data pipeline: KITTI readers, padded batch assembly."""
