"""Self-gravity (reference: src/gravity/)."""
