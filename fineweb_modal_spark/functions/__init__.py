"""Column-expression helpers and dialect-portable SQL rendering."""
