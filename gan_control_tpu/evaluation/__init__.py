"""L7 evaluation / observability layer.

Reference: evaluation/ (tracker, generation, separability, per-attribute
evals, inference_class) + fid_utils/ (SURVEY.md §2.7)."""
