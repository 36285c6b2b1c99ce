"""Dataset ETL tools: labelbox/labelme conversion, mask recoloring, split
generation and audit, offline 8x/5x augmentation (L0 of SURVEY.md §1)."""
