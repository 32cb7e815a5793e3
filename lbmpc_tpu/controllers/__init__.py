"""controllers subpackage."""
