// Fast KITTI detection AP evaluator (C ABI, used via ctypes).
//
// Native twin of dodt_tpu/eval/kitti_ap.py implementing the official
// 41-point protocol of the KITTI benchmark (the reference ships the
// upstream C++ scorer at scripts/offline_eval/kitti_native_eval/
// evaluate_object_3d_offline.cpp; this is an independent
// implementation of the same published scoring rules).
//
// Exposes one function:
//   double kitti_ap(metric, difficulty, min_iou,
//                   n_frames,
//                   gt_counts, gt_boxes7, gt_bbox4, gt_kind,
//                   det_counts, det_boxes7, det_bbox4, det_scores,
//                   det_is_class)
// where per-frame GT arrays are concatenated and counts give the
// per-frame lengths; gt_kind is 0 = valid, 1 = ignored, -1 = other
// class (classification done host-side in Python, which owns the
// class/difficulty tables).
//
// Build: see build_native.sh (g++ -O3 -shared -fPIC).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr int kSamplePts = 41;

struct Pt { double x, z; };

double cross(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.z - o.z) - (a.z - o.z) * (b.x - o.x);
}

// Sutherland-Hodgman clip of convex polygon by half-plane left of a->b.
void clip(std::vector<Pt>& poly, const Pt& a, const Pt& b,
          std::vector<Pt>& out) {
  out.clear();
  const size_t n = poly.size();
  for (size_t i = 0; i < n; ++i) {
    const Pt& cur = poly[i];
    const Pt& nxt = poly[(i + 1) % n];
    double dc = cross(a, b, cur);
    double dn = cross(a, b, nxt);
    if (dc >= 0) out.push_back(cur);
    if ((dc > 0) != (dn > 0) && (dc < 0 || dn < 0)) {
      double t = dc / (dc - dn);
      out.push_back({cur.x + t * (nxt.x - cur.x),
                     cur.z + t * (nxt.z - cur.z)});
    }
  }
  poly = out;
}

double polyArea(const std::vector<Pt>& p) {
  if (p.size() < 3) return 0.0;
  double s = 0.0;
  for (size_t i = 0; i < p.size(); ++i) {
    const Pt& a = p[i];
    const Pt& b = p[(i + 1) % p.size()];
    s += a.x * b.z - b.x * a.z;
  }
  return std::fabs(s) * 0.5;
}

void rectCorners(const double* b7, Pt out[4]) {
  // box7: x y z l w h ry  (camera frame, footprint in xz)
  double c = std::cos(b7[6]), s = std::sin(b7[6]);
  double l2 = b7[3] / 2, w2 = b7[4] / 2;
  double xs[4] = {l2, l2, -l2, -l2};
  double zs[4] = {w2, -w2, -w2, w2};
  for (int i = 0; i < 4; ++i) {
    out[i].x = c * xs[i] + s * zs[i] + b7[0];
    out[i].z = -s * xs[i] + c * zs[i] + b7[2];
  }
}

double rotatedInter(const double* a7, const double* b7) {
  Pt pa[4], pb[4];
  rectCorners(a7, pa);
  rectCorners(b7, pb);
  std::vector<Pt> poly(pa, pa + 4), tmp;
  // orient clip rect CCW
  double area2 = 0;
  for (int i = 0; i < 4; ++i) {
    const Pt& p = pb[i];
    const Pt& q = pb[(i + 1) % 4];
    area2 += p.x * q.z - q.x * p.z;
  }
  Pt pbo[4];
  for (int i = 0; i < 4; ++i) pbo[i] = area2 < 0 ? pb[3 - i] : pb[i];
  for (int i = 0; i < 4 && !poly.empty(); ++i)
    clip(poly, pbo[i], pbo[(i + 1) % 4], tmp);
  return polyArea(poly);
}

// metric: 0 = image (2D bbox), 1 = ground (rotated BEV), 2 = 3d
double overlap(int metric, const double* d7, const double* d4,
               const double* g7, const double* g4) {
  if (metric == 0) {
    double x1 = std::max(d4[0], g4[0]);
    double y1 = std::max(d4[1], g4[1]);
    double x2 = std::min(d4[2], g4[2]);
    double y2 = std::min(d4[3], g4[3]);
    double inter = std::max(0.0, x2 - x1) * std::max(0.0, y2 - y1);
    double ua = (d4[2] - d4[0]) * (d4[3] - d4[1]) +
                (g4[2] - g4[0]) * (g4[3] - g4[1]) - inter;
    return ua > 0 ? inter / ua : 0.0;
  }
  double inter2d = rotatedInter(d7, g7);
  if (metric == 1) {
    double ua = d7[3] * d7[4] + g7[3] * g7[4] - inter2d;
    return ua > 0 ? inter2d / ua : 0.0;
  }
  // camera y points down; box spans [y-h, y]
  double hov = std::min(d7[1], g7[1]) -
               std::max(d7[1] - d7[5], g7[1] - g7[5]);
  double inter = inter2d * std::max(0.0, hov);
  double ua = d7[3] * d7[4] * d7[5] + g7[3] * g7[4] * g7[5] - inter;
  return ua > 0 ? inter / ua : 0.0;
}

}  // namespace

extern "C" {

double kitti_ap(int metric, double min_iou, double min_height,
                int n_frames, const int32_t* gt_counts,
                const double* gt_boxes7, const double* gt_bbox4,
                const int32_t* gt_kind, const int32_t* det_counts,
                const double* det_boxes7, const double* det_bbox4,
                const double* det_scores, const int32_t* det_is_class) {
  // Precompute per-frame offsets.
  std::vector<int> gt_off(n_frames + 1, 0), det_off(n_frames + 1, 0);
  for (int f = 0; f < n_frames; ++f) {
    gt_off[f + 1] = gt_off[f] + gt_counts[f];
    det_off[f + 1] = det_off[f] + det_counts[f];
  }
  int total_gt = gt_off[n_frames];
  int total_det = det_off[n_frames];

  // Precompute IoU matrices per frame (det x gt) lazily into one blob.
  std::vector<double> iou;
  std::vector<int> iou_off(n_frames + 1, 0);
  for (int f = 0; f < n_frames; ++f)
    iou_off[f + 1] = iou_off[f] + det_counts[f] * gt_counts[f];
  iou.resize(iou_off[n_frames]);
  for (int f = 0; f < n_frames; ++f) {
    for (int d = 0; d < det_counts[f]; ++d) {
      int di = det_off[f] + d;
      for (int g = 0; g < gt_counts[f]; ++g) {
        int gi = gt_off[f] + g;
        iou[iou_off[f] + d * gt_counts[f] + g] =
            overlap(metric, det_boxes7 + 7 * di, det_bbox4 + 4 * di,
                    gt_boxes7 + 7 * gi, gt_bbox4 + 4 * gi);
      }
    }
  }

  // Pass 1: TP scores at threshold 0 -> 41-point thresholds.
  std::vector<double> tp_scores;
  int n_valid_gt = 0;
  for (int f = 0; f < n_frames; ++f) {
    for (int g = 0; g < gt_counts[f]; ++g) {
      int gi = gt_off[f] + g;
      if (gt_kind[gi] != 0) continue;
      ++n_valid_gt;
      int best = -1;
      double best_iou = min_iou;
      for (int d = 0; d < det_counts[f]; ++d) {
        int di = det_off[f] + d;
        if (!det_is_class[di]) continue;
        double v = iou[iou_off[f] + d * gt_counts[f] + g];
        if (v >= best_iou) {
          best_iou = v;
          best = di;
        }
      }
      if (best >= 0) tp_scores.push_back(det_scores[best]);
    }
  }
  if (n_valid_gt == 0) return 0.0;
  std::sort(tp_scores.begin(), tp_scores.end(), std::greater<double>());
  std::vector<double> thresholds;
  double cur_recall = 0.0;
  for (size_t i = 0; i < tp_scores.size(); ++i) {
    double l = double(i + 1) / n_valid_gt;
    double r = i < tp_scores.size() - 1 ? double(i + 2) / n_valid_gt : l;
    if ((r - cur_recall) < (cur_recall - l) &&
        i < tp_scores.size() - 1)
      continue;
    thresholds.push_back(tp_scores[i]);
    cur_recall += 1.0 / (kSamplePts - 1);
  }

  std::vector<double> precision(kSamplePts, 0.0);
  std::vector<char> assigned(total_det);
  for (size_t ti = 0; ti < thresholds.size(); ++ti) {
    double thr = thresholds[ti];
    long tp = 0, fp = 0;
    std::fill(assigned.begin(), assigned.end(), 0);
    for (int f = 0; f < n_frames; ++f) {
      // valid GT take their best candidate
      for (int g = 0; g < gt_counts[f]; ++g) {
        int gi = gt_off[f] + g;
        if (gt_kind[gi] != 0) continue;
        int best = -1;
        double best_iou = min_iou;
        for (int d = 0; d < det_counts[f]; ++d) {
          int di = det_off[f] + d;
          if (!det_is_class[di] || assigned[di]) continue;
          if (det_scores[di] < thr) continue;
          double v = iou[iou_off[f] + d * gt_counts[f] + g];
          if (v >= best_iou) {
            best_iou = v;
            best = di;
          }
        }
        if (best >= 0) {
          ++tp;
          assigned[best] = 1;
        }
      }
      // ignored GT absorb remaining candidates
      for (int g = 0; g < gt_counts[f]; ++g) {
        int gi = gt_off[f] + g;
        if (gt_kind[gi] != 1) continue;
        for (int d = 0; d < det_counts[f]; ++d) {
          int di = det_off[f] + d;
          if (!det_is_class[di] || assigned[di]) continue;
          if (det_scores[di] < thr) continue;
          if (iou[iou_off[f] + d * gt_counts[f] + g] >= min_iou) {
            assigned[di] = 1;
            break;
          }
        }
      }
      // FPs: unassigned candidates of sufficient height
      for (int d = 0; d < det_counts[f]; ++d) {
        int di = det_off[f] + d;
        if (!det_is_class[di] || assigned[di]) continue;
        if (det_scores[di] < thr) continue;
        double h = det_bbox4[4 * di + 3] - det_bbox4[4 * di + 1];
        if (h >= min_height) ++fp;
      }
    }
    precision[ti] = (tp + fp) > 0 ? double(tp) / (tp + fp) : 0.0;
  }

  for (int i = kSamplePts - 2; i >= 0; --i)
    precision[i] = std::max(precision[i], precision[i + 1]);
  double ap = 0.0;
  for (size_t i = 0; i < thresholds.size() && i < size_t(kSamplePts);
       ++i)
    ap += precision[i];
  return 100.0 * ap / kSamplePts;
}

}  // extern "C"
