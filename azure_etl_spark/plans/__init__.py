"""Named query plans + medallion pipeline assembly."""
