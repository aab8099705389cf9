"""Fine-tuning stack: metrics, hard-negative mining, training loop."""
