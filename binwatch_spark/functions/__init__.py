"""Engine-level scalar/array functions shared by operators and oracle SQL."""
