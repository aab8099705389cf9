"""Pretraining stack: augmentations, tasks, schedulers, multi-task optim."""
