"""Classification pipelines (SURVEY.md §2.5 last row, build-plan phase 4).

The reference's README promises "back-propagation fine tuning" but ships no
classifier (/root/reference/README.md:2; SURVEY.md §2.6). This package is
that missing layer, built the idiomatic Spark way: MLlib estimators over
the stacked-RBM features from `..rbm`.
"""
