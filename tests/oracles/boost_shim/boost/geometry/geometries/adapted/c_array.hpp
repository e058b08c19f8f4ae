// Empty shim: everything lives in boost/geometry.hpp
#include <boost/geometry.hpp>
