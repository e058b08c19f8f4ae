// Minimal boost::geometry shim — just enough surface to compile the
// official KITTI evaluator as a test oracle. The evaluator only uses:
// convex rotated-rectangle polygons, append() of a closed 5-point
// c-array ring, intersection(), union_() (only ever for the total
// union area), and area().
//
// Intersection is exact Sutherland-Hodgman convex clipping; union is
// represented as a pseudo-polygon carrying area(A)+area(B)-area(A∩B),
// which is exactly how the official code consumes it (it only ever
// reads area(un.front())). Test-oracle infrastructure only.
#ifndef DODT_GEOMETRY_SHIM_HPP
#define DODT_GEOMETRY_SHIM_HPP

#include <cmath>
#include <cstddef>
#include <vector>

#define BOOST_GEOMETRY_REGISTER_C_ARRAY_CS(cs)

namespace boost { namespace geometry {

namespace cs { struct cartesian {}; }

namespace model {
namespace d2 {
template <typename T>
struct point_xy {
  T x_, y_;
};
}  // namespace d2

template <typename Point>
struct polygon {
  std::vector<std::pair<double, double> > ring;
  double forced_area = -1.0;  // >= 0: area override (union result)
};
}  // namespace model

// append a closed ring given as double[N][2]
template <typename Poly, std::size_t N>
void append(Poly& poly, const double (&pts)[N][2]) {
  for (std::size_t i = 0; i < N; ++i)
    poly.ring.push_back(std::make_pair(pts[i][0], pts[i][1]));
}

namespace detail {

inline double ring_area(
    const std::vector<std::pair<double, double> >& r) {
  if (r.size() < 3) return 0.0;
  double s = 0.0;
  for (std::size_t i = 0; i + 1 < r.size(); ++i)
    s += r[i].first * r[i + 1].second - r[i + 1].first * r[i].second;
  // close the ring if the input isn't closed
  if (r.front() != r.back())
    s += r.back().first * r.front().second -
         r.front().first * r.back().second;
  return std::fabs(s) * 0.5;
}

inline double cross3(const std::pair<double, double>& o,
                     const std::pair<double, double>& a,
                     const std::pair<double, double>& b) {
  return (a.first - o.first) * (b.second - o.second) -
         (a.second - o.second) * (b.first - o.first);
}

// Sutherland-Hodgman convex clip of `subject` by convex `clip_poly`
// (works for either ring orientation by orienting the clip ring CCW).
inline std::vector<std::pair<double, double> > convex_intersection(
    std::vector<std::pair<double, double> > subject,
    std::vector<std::pair<double, double> > clip_ring) {
  // drop duplicate closing points
  if (subject.size() > 1 && subject.front() == subject.back())
    subject.pop_back();
  if (clip_ring.size() > 1 && clip_ring.front() == clip_ring.back())
    clip_ring.pop_back();
  if (subject.size() < 3 || clip_ring.size() < 3) return {};
  // orient clip ring CCW
  double a2 = 0.0;
  for (std::size_t i = 0; i < clip_ring.size(); ++i) {
    const auto& p = clip_ring[i];
    const auto& q = clip_ring[(i + 1) % clip_ring.size()];
    a2 += p.first * q.second - q.first * p.second;
  }
  if (a2 < 0) {
    std::vector<std::pair<double, double> > rev(clip_ring.rbegin(),
                                                clip_ring.rend());
    clip_ring.swap(rev);
  }
  std::vector<std::pair<double, double> > poly = subject, out;
  for (std::size_t e = 0; e < clip_ring.size() && !poly.empty(); ++e) {
    const auto& A = clip_ring[e];
    const auto& B = clip_ring[(e + 1) % clip_ring.size()];
    out.clear();
    for (std::size_t i = 0; i < poly.size(); ++i) {
      const auto& cur = poly[i];
      const auto& nxt = poly[(i + 1) % poly.size()];
      double dc = cross3(A, B, cur);
      double dn = cross3(A, B, nxt);
      if (dc >= 0) out.push_back(cur);
      if ((dc > 0 && dn < 0) || (dc < 0 && dn > 0)) {
        double t = dc / (dc - dn);
        out.push_back(std::make_pair(
            cur.first + t * (nxt.first - cur.first),
            cur.second + t * (nxt.second - cur.second)));
      }
    }
    poly = out;
  }
  return poly;
}

}  // namespace detail

template <typename Poly>
double area(const Poly& p) {
  if (p.forced_area >= 0.0) return p.forced_area;
  return detail::ring_area(p.ring);
}

template <typename Poly>
void intersection(const Poly& a, const Poly& b, std::vector<Poly>& out) {
  auto ring = detail::convex_intersection(a.ring, b.ring);
  if (detail::ring_area(ring) > 0.0) {
    Poly p;
    p.ring = ring;
    out.push_back(p);
  }
}

template <typename Poly>
void union_(const Poly& a, const Poly& b, std::vector<Poly>& out) {
  auto inter = detail::convex_intersection(a.ring, b.ring);
  Poly p;
  p.forced_area = detail::ring_area(a.ring) + detail::ring_area(b.ring) -
                  detail::ring_area(inter);
  out.push_back(p);
}

}}  // namespace boost::geometry

#endif
