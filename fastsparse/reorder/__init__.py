"""On-device space-filling-curve keys and entry sorting."""
