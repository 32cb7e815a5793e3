"""sets subpackage."""
