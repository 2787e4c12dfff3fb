"""Trainer / evaluator layer (reference L4: ``fusion_train.py`` / ``fusion_test.py``)."""
