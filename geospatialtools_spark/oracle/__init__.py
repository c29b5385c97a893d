"""Pure-numpy line-by-line ports of the reference kernels.

These are the golden oracle for the Spark operators (SURVEY.md §5.2): the
reference's f2py Fortran is not buildable here, so each port follows
``/root/reference/src/*.f90`` statement-by-statement (citations in each
docstring) and the Spark engine is tested bit-for-bit against these.

Deliberate, documented deviations from the Fortran (all are
undefined-behaviour paths in the reference — out-of-bounds array reads that
gfortran compiles without bounds checks):

- neighbor probes that would index outside the grid are treated as
  "no match" (``terrain_tools.f90:1417-1432, 1462-1528`` lack bounds guards);
- a hillslope seed whose flow direction is undefined starts its clockwise
  sweep at position 1 (``terrain_tools.f90:1398`` would otherwise loop from
  literal -9999).
"""

from . import terrain  # noqa: F401
