"""Table IO: checkpoint tables + driver testdata loading."""
