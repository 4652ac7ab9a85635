"""Structured-Streaming surface: CDC event feed → incremental star merge."""
