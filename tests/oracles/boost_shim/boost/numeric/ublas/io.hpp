// Empty shim — the official evaluator includes this but never uses it.
#ifndef DODT_UBLAS_SHIM_IO_HPP
#define DODT_UBLAS_SHIM_IO_HPP
#endif
