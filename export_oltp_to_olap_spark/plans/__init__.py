"""Logical plans: star-ETL builders, fixture adapter, flagship analytics."""
