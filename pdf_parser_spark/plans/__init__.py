"""Session factory and plan-level tuning (AQE, Arrow, shuffle sizing)."""
