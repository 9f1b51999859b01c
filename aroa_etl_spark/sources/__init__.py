"""Sources: readers/writers and nested-JSON unpacking."""
