"""Sources & sinks: batch readers, streaming sources, synthetic data."""
