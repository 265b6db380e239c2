"""Composable DataFrame→DataFrame operators (the engine's verbs)."""
