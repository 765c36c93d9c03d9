"""Binary sources: the PBF-shaped OSM record parser (S5 analog)."""
