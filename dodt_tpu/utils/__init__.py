"""Host-side utilities (numpy geometry, misc)."""
