"""Pure kernels (no Ray): exact transliterations of the reference's
string/URL/HTML/token semantics.  Every function cites the reference
file:line it reproduces (root: ``/root/reference/Distributed Web Search
Engine /``)."""
