"""DataFrame -> DataFrame operators (the engine's logical operator set)."""
