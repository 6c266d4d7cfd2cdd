// Approximate convex decomposition tool (offline, host-side).
//
// TPU-native replacement for the PhysX VHACD cooking path the reference
// drives through AssetOptions.vhacd_enabled
// (/root/reference/examples/convex_decomposition.py:81-98). Runs at
// asset-load time with results cached per mesh hash (assets/vhacd.py), so
// device programs never depend on runtime mesh cooking (SURVEY.md sec 7.3.7).
//
// Algorithm: hierarchical binary space bisection + quickhull. A vertex set
// whose convex hull exceeds the concavity budget is split along its longest
// principal axis; leaves emit their (vertex-count-capped) hulls. Each output
// piece is convex by construction; the union conservatively covers the input
// surface samples. This is an ACD in the VHACD family, not a port of any
// existing implementation.
//
// CLI:  vhacd_tool verts.npy faces.npy max_hulls max_verts resolution out.raw
//   verts.npy: float32 (V, 3), faces.npy: int32 (F, 3) (faces are used for
//   surface sampling so thin features survive).
// Output (out.raw): int32 num_hulls, then per hull: int32 nv, float32 nv*3.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <numeric>
#include <string>
#include <vector>

using std::size_t;

struct V3 {
  double x = 0, y = 0, z = 0;
  V3() = default;
  V3(double a, double b, double c) : x(a), y(b), z(c) {}
  V3 operator-(const V3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  V3 operator+(const V3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  V3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const V3& o) const { return x * o.x + y * o.y + z * o.z; }
  V3 cross(const V3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(dot(*this)); }
};

// ---------------------------------------------------------------------------
// minimal .npy reader (v1.x, little-endian, C-order)
static bool read_npy(const std::string& path, std::vector<double>& out,
                     std::vector<size_t>& shape, bool as_int) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  unsigned char ver[2];
  f.read(reinterpret_cast<char*>(ver), 2);
  uint32_t hlen = 0;
  if (ver[0] == 1) {
    uint16_t h16;
    f.read(reinterpret_cast<char*>(&h16), 2);
    hlen = h16;
  } else {
    f.read(reinterpret_cast<char*>(&hlen), 4);
  }
  std::string header(hlen, ' ');
  f.read(&header[0], hlen);
  // parse shape
  auto sp = header.find("'shape':");
  auto l = header.find('(', sp);
  auto r = header.find(')', l);
  std::string dims = header.substr(l + 1, r - l - 1);
  shape.clear();
  size_t pos = 0;
  while (pos < dims.size()) {
    while (pos < dims.size() && !isdigit(dims[pos])) pos++;
    if (pos >= dims.size()) break;
    size_t end = pos;
    while (end < dims.size() && isdigit(dims[end])) end++;
    shape.push_back(std::stoull(dims.substr(pos, end - pos)));
    pos = end;
  }
  size_t count = 1;
  for (size_t d : shape) count *= d;
  out.resize(count);
  bool f32 = header.find("<f4") != std::string::npos;
  bool f64 = header.find("<f8") != std::string::npos;
  bool i32 = header.find("<i4") != std::string::npos;
  bool i64 = header.find("<i8") != std::string::npos;
  for (size_t i = 0; i < count; i++) {
    if (f32) {
      float v;
      f.read(reinterpret_cast<char*>(&v), 4);
      out[i] = v;
    } else if (f64) {
      double v;
      f.read(reinterpret_cast<char*>(&v), 8);
      out[i] = v;
    } else if (i32) {
      int32_t v;
      f.read(reinterpret_cast<char*>(&v), 4);
      out[i] = v;
    } else if (i64) {
      int64_t v;
      f.read(reinterpret_cast<char*>(&v), 8);
      out[i] = static_cast<double>(v);
    } else {
      return false;
    }
  }
  (void)as_int;
  return true;
}

// ---------------------------------------------------------------------------
// quickhull 3D (indices into pts); returns hull vertex indices
struct Face {
  int a, b, c;
  V3 n;
  double d;
  bool alive = true;
};

static V3 face_normal(const std::vector<V3>& P, int a, int b, int c) {
  return (P[b] - P[a]).cross(P[c] - P[a]);
}

static std::vector<int> quickhull(const std::vector<V3>& P) {
  const size_t n = P.size();
  if (n < 4) {
    std::vector<int> all(n);
    std::iota(all.begin(), all.end(), 0);
    return all;
  }
  // initial tetrahedron: extreme points
  int ix0 = 0, ix1 = 0;
  for (size_t i = 1; i < n; i++) {
    if (P[i].x < P[ix0].x) ix0 = static_cast<int>(i);
    if (P[i].x > P[ix1].x) ix1 = static_cast<int>(i);
  }
  if (ix0 == ix1) ix1 = (ix0 + 1) % static_cast<int>(n);
  int ix2 = -1;
  double best = -1;
  V3 ab = P[ix1] - P[ix0];
  for (size_t i = 0; i < n; i++) {
    double a = ab.cross(P[i] - P[ix0]).norm();
    if (a > best) {
      best = a;
      ix2 = static_cast<int>(i);
    }
  }
  int ix3 = -1;
  best = -1;
  V3 nrm = face_normal(P, ix0, ix1, ix2);
  for (size_t i = 0; i < n; i++) {
    double d = std::fabs(nrm.dot(P[i] - P[ix0]));
    if (d > best) {
      best = d;
      ix3 = static_cast<int>(i);
    }
  }
  if (best < 1e-12) {  // planar: return 2D-ish hull = all extreme points
    std::vector<int> all(n);
    std::iota(all.begin(), all.end(), 0);
    return all;
  }
  std::vector<Face> faces;
  auto add_face = [&](int a, int b, int c, const V3& inside) {
    Face f;
    f.a = a;
    f.b = b;
    f.c = c;
    f.n = face_normal(P, a, b, c);
    if (f.n.dot(inside - P[a]) > 0) {
      std::swap(f.b, f.c);
      f.n = f.n * -1.0;
    }
    double nl = f.n.norm();
    if (nl > 1e-20) f.n = f.n * (1.0 / nl);
    f.d = f.n.dot(P[f.a]);
    faces.push_back(f);
  };
  V3 centroid = (P[ix0] + P[ix1] + P[ix2] + P[ix3]) * 0.25;
  add_face(ix0, ix1, ix2, centroid);
  add_face(ix0, ix1, ix3, centroid);
  add_face(ix0, ix2, ix3, centroid);
  add_face(ix1, ix2, ix3, centroid);

  // iterate: for each live face find farthest outside point, expand
  for (int iter = 0; iter < 4096; iter++) {
    int fi = -1, pi = -1;
    double fbest = 1e-9;
    for (size_t f = 0; f < faces.size(); f++) {
      if (!faces[f].alive) continue;
      for (size_t i = 0; i < n; i++) {
        double d = faces[f].n.dot(P[i]) - faces[f].d;
        if (d > fbest) {
          fbest = d;
          fi = static_cast<int>(f);
          pi = static_cast<int>(i);
        }
      }
    }
    if (fi < 0) break;
    // find all faces visible from pi, collect horizon edges
    std::vector<std::array<int, 2>> horizon;
    for (auto& f : faces) {
      if (!f.alive) continue;
      if (f.n.dot(P[pi]) - f.d > 1e-10) f.alive = false;
    }
    auto edge_count = [&](int a, int b) {
      int cnt = 0;
      for (auto& f : faces) {
        if (f.alive) continue;
        // count dead-face edges; horizon edge = shared with a live face
        (void)f;
      }
      return cnt;
    };
    (void)edge_count;
    // horizon: edges of dead faces adjacent to live faces (or boundary)
    std::vector<std::array<int, 2>> dead_edges;
    for (auto& f : faces) {
      if (f.alive || f.n.norm() < 0.5) continue;
      if (f.n.dot(P[pi]) - f.d <= 1e-10) continue;  // only just-killed ones
    }
    // simpler: rebuild horizon as edges appearing exactly once among dead faces
    std::vector<std::array<int, 2>> edges;
    for (auto& f : faces) {
      if (f.alive) continue;
      edges.push_back({f.a, f.b});
      edges.push_back({f.b, f.c});
      edges.push_back({f.c, f.a});
    }
    for (auto& e : edges) {
      int cnt = 0;
      for (auto& e2 : edges) {
        if ((e[0] == e2[1] && e[1] == e2[0]) || (e[0] == e2[0] && e[1] == e2[1]))
          cnt++;
      }
      if (cnt == 1) horizon.push_back(e);
    }
    // prune dead faces permanently
    std::vector<Face> live;
    for (auto& f : faces)
      if (f.alive) live.push_back(f);
    faces.swap(live);
    for (auto& e : horizon) add_face(e[0], e[1], pi, centroid);
    if (faces.size() > 2048) break;  // safety
  }
  std::vector<int> used;
  for (auto& f : faces) {
    if (!f.alive) continue;
    used.push_back(f.a);
    used.push_back(f.b);
    used.push_back(f.c);
  }
  std::sort(used.begin(), used.end());
  used.erase(std::unique(used.begin(), used.end()), used.end());
  return used;
}

// convex-hull volume of a point set: enumerate unique hull planes, take the
// convex polygon of hull points on each plane (angle-sorted fan), and sum
// polygon-area x distance-to-centroid / 3 (divergence theorem). Robust to
// coplanar points, unlike a raw triangle-triple fan.
static double hull_volume(const std::vector<V3>& pts) {
  std::vector<int> hull = quickhull(pts);
  if (hull.size() < 4) return 0.0;
  std::vector<V3> hp;
  for (int h : hull) hp.push_back(pts[h]);
  const size_t m = hp.size();
  V3 c;
  for (auto& q : hp) c = c + q;
  c = c * (1.0 / m);

  struct Plane {
    V3 n;
    double d;
  };
  std::vector<Plane> planes;
  auto near_plane = [](const Plane& p, const V3& n, double d) {
    return (p.n - n).norm() < 1e-6 && std::fabs(p.d - d) < 1e-8;
  };
  double scale = 0;
  for (auto& q : hp) scale = std::max(scale, (q - c).norm());
  const double tol = std::max(1e-9, 1e-7 * scale);
  for (size_t i = 0; i < m; i++)
    for (size_t j = i + 1; j < m; j++)
      for (size_t k = j + 1; k < m; k++) {
        V3 n = (hp[j] - hp[i]).cross(hp[k] - hp[i]);
        double nl = n.norm();
        if (nl < 1e-14) continue;
        n = n * (1.0 / nl);
        double d = n.dot(hp[i]);
        if (n.dot(c) > d) {  // orient outward
          n = n * -1.0;
          d = -d;
        }
        bool outside = false;
        for (size_t t = 0; t < m && !outside; t++)
          if (n.dot(hp[t]) - d > tol) outside = true;
        if (outside) continue;
        bool dup = false;
        for (auto& pl : planes)
          if (near_plane(pl, n, d)) {
            dup = true;
            break;
          }
        if (!dup) planes.push_back({n, d});
      }

  double vol = 0;
  for (auto& pl : planes) {
    std::vector<V3> on;
    for (auto& q : hp)
      if (std::fabs(pl.n.dot(q) - pl.d) <= tol) on.push_back(q);
    if (on.size() < 3) continue;
    V3 fc;
    for (auto& q : on) fc = fc + q;
    fc = fc * (1.0 / on.size());
    // 2D basis on the plane
    V3 u = (on[0] - fc);
    if (u.norm() < 1e-14) continue;
    u = u * (1.0 / u.norm());
    V3 v = pl.n.cross(u);
    std::sort(on.begin(), on.end(), [&](const V3& a2, const V3& b2) {
      return std::atan2((a2 - fc).dot(v), (a2 - fc).dot(u)) <
             std::atan2((b2 - fc).dot(v), (b2 - fc).dot(u));
    });
    double area = 0;
    for (size_t i = 0; i < on.size(); i++) {
      const V3& a2 = on[i];
      const V3& b2 = on[(i + 1) % on.size()];
      area += 0.5 * ((a2 - fc).cross(b2 - fc)).dot(pl.n);
    }
    area = std::fabs(area);
    vol += area * std::fabs(pl.n.dot(c) - pl.d) / 3.0;
  }
  return vol;
}

struct Tri {
  V3 a, b, c;
};

struct Piece {
  std::vector<V3> pts;   // sample points (verts + centroids + cut points)
  std::vector<Tri> tris;  // clipped surface triangles
  int depth = 0;         // forced-split recursion bound
};

// approximate enclosed volume of an (open, clipped) triangle soup: signed
// tet volumes about the centroid. Exact for closed meshes; for clipped
// pieces it is a usable concavity heuristic.
static double mesh_volume(const std::vector<Tri>& tris) {
  if (tris.empty()) return 0.0;
  V3 c;
  size_t n = 0;
  for (auto& t : tris) {
    c = c + (t.a + t.b + t.c) * (1.0 / 3.0);
    n++;
  }
  c = c * (1.0 / n);
  double vol = 0.0;
  for (auto& t : tris) {
    V3 ta = t.a - c, tb = t.b - c, tc = t.c - c;
    vol += ta.dot(tb.cross(tc)) / 6.0;
  }
  return std::fabs(vol);
}

// clip a triangle against axis-halfspace coord <= mid (keep_le) or > mid,
// appending resulting triangles (Sutherland-Hodgman + fan triangulation)
static void clip_tri(const Tri& t, int axis, double mid, bool keep_le,
                     std::vector<Tri>& out, std::vector<V3>& cut_pts) {
  auto coord = [&](const V3& p) {
    return axis == 0 ? p.x : axis == 1 ? p.y : p.z;
  };
  std::array<V3, 3> v{t.a, t.b, t.c};
  std::vector<V3> poly;
  for (int i = 0; i < 3; i++) {
    const V3& cur = v[i];
    const V3& nxt = v[(i + 1) % 3];
    bool cin = keep_le ? coord(cur) <= mid : coord(cur) > mid;
    bool nin = keep_le ? coord(nxt) <= mid : coord(nxt) > mid;
    if (cin) poly.push_back(cur);
    if (cin != nin) {
      double d = coord(nxt) - coord(cur);
      double tt = std::fabs(d) < 1e-20 ? 0.5 : (mid - coord(cur)) / d;
      V3 ip = cur + (nxt - cur) * tt;
      poly.push_back(ip);
      cut_pts.push_back(ip);
    }
  }
  for (size_t i = 2; i < poly.size(); i++)
    out.push_back({poly[0], poly[i - 1], poly[i]});
}

int main(int argc, char** argv) {
  if (argc < 7) {
    std::fprintf(stderr,
                 "usage: vhacd_tool verts.npy faces.npy max_hulls max_verts "
                 "resolution out.raw\n");
    return 2;
  }
  std::string vpath = argv[1], fpath = argv[2], opath = argv[6];
  int max_hulls = std::atoi(argv[3]);
  int max_verts = std::atoi(argv[4]);

  std::vector<double> vraw, fraw;
  std::vector<size_t> vshape, fshape;
  if (!read_npy(vpath, vraw, vshape, false)) return 3;
  read_npy(fpath, fraw, fshape, true);

  std::vector<V3> pts(vshape[0]);
  for (size_t i = 0; i < vshape[0]; i++)
    pts[i] = {vraw[3 * i], vraw[3 * i + 1], vraw[3 * i + 2]};
  // surface sampling from faces so sparse meshes still split sensibly
  if (fshape.size() == 2 && fshape[0] > 0) {
    for (size_t t = 0; t < fshape[0]; t++) {
      int a = static_cast<int>(fraw[3 * t]);
      int b = static_cast<int>(fraw[3 * t + 1]);
      int c = static_cast<int>(fraw[3 * t + 2]);
      if (a < 0 || b < 0 || c < 0) continue;
      if (static_cast<size_t>(std::max({a, b, c})) >= pts.size()) continue;
      pts.push_back((pts[a] + pts[b] + pts[c]) * (1.0 / 3.0));
    }
  }

  // trial-split acceptance: a split is kept when the children's hull
  // volumes sum to meaningfully less than the parent's (i.e. the parent was
  // concave); a convex piece has ratio ~1 and is emitted as-is.
  Piece root;
  root.pts = pts;
  if (fshape.size() == 2) {
    for (size_t t = 0; t < fshape[0]; t++) {
      int a = static_cast<int>(fraw[3 * t]);
      int b = static_cast<int>(fraw[3 * t + 1]);
      int c = static_cast<int>(fraw[3 * t + 2]);
      if (a < 0 || b < 0 || c < 0) continue;
      if (static_cast<size_t>(std::max({a, b, c})) >=
          static_cast<size_t>(vshape[0]))
        continue;
      root.tris.push_back({pts[a], pts[b], pts[c]});
    }
  }
  std::vector<Piece> queue{root};
  std::vector<Piece> done;
  const double convex_ratio = 0.90;
  while (!queue.empty() &&
         static_cast<int>(done.size() + queue.size()) < max_hulls) {
    Piece p = queue.back();
    queue.pop_back();
    if (p.pts.size() < 8) {
      done.push_back(p);
      continue;
    }
    double parent_vol = hull_volume(p.pts);
    // CONCAVITY of the piece: how much of its hull volume the actual
    // surface does NOT enclose. A mug split down the middle loses almost
    // no hull volume (the bowl cavity halves stay "filled" by both child
    // hulls), so split-gain alone declares it convex — the concavity test
    // keeps splitting such pieces until the pieces hug the surface.
    double mvol = mesh_volume(p.tris);
    double concavity =
        parent_vol > 1e-12 ? 1.0 - std::min(1.0, mvol / parent_vol) : 0.0;
    // clipped children are OPEN at their cut planes, so mesh_volume
    // under-reads and concavity over-reads as depth grows — bound the
    // forced recursion to depth 4 (<= 16 forced leaves) and require the
    // split to still help a little
    bool force = concavity > 0.35 && p.depth < 4 && !p.tris.empty();

    // trial-split every axis at its bbox midpoint; keep the best ratio
    V3 lo(1e30, 1e30, 1e30), hi(-1e30, -1e30, -1e30);
    for (auto& q : p.pts) {
      lo = {std::min(lo.x, q.x), std::min(lo.y, q.y), std::min(lo.z, q.z)};
      hi = {std::max(hi.x, q.x), std::max(hi.y, q.y), std::max(hi.z, q.z)};
    }
    double best_ratio = 1e30;
    Piece best_a, best_b;
    for (int axis = 0; axis < 3; axis++) {
      double l = axis == 0 ? lo.x : axis == 1 ? lo.y : lo.z;
      double h = axis == 0 ? hi.x : axis == 1 ? hi.y : hi.z;
      if (h - l < 1e-12) continue;
      double mid = 0.5 * (l + h);
      Piece a, b;
      a.depth = b.depth = p.depth + 1;
      for (auto& q : p.pts) {
        double cd = axis == 0 ? q.x : axis == 1 ? q.y : q.z;
        (cd <= mid ? a : b).pts.push_back(q);
      }
      // clip the surface triangles at the plane: the cut cross-section
      // points join BOTH children so their hulls cover the halves exactly
      std::vector<V3> cuts;
      for (auto& t : p.tris) {
        clip_tri(t, axis, mid, true, a.tris, cuts);
        clip_tri(t, axis, mid, false, b.tris, cuts);
      }
      for (auto& cp : cuts) {
        a.pts.push_back(cp);
        b.pts.push_back(cp);
      }
      if (a.pts.size() < 4 || b.pts.size() < 4) continue;
      double va = hull_volume(a.pts), vb = hull_volume(b.pts);
      if (va <= 1e-12 || vb <= 1e-12) continue;
      double ratio = parent_vol > 0 ? (va + vb) / parent_vol : 1e30;
      if (ratio < best_ratio) {
        best_ratio = ratio;
        best_a = std::move(a);
        best_b = std::move(b);
      }
    }
    if (std::getenv("VHACD_DEBUG"))
      std::fprintf(stderr,
                   "piece depth=%d n=%zu parent=%g conc=%g best_ratio=%g\n",
                   p.depth, p.pts.size(), parent_vol, concavity, best_ratio);
    if (best_ratio < convex_ratio || (force && best_ratio < 0.98)) {
      queue.push_back(best_a);
      queue.push_back(best_b);
    } else {
      done.push_back(p);  // convex enough
    }
  }
  for (auto& p : queue) done.push_back(p);

  std::ofstream out(opath, std::ios::binary);
  int32_t nh = static_cast<int32_t>(done.size());
  out.write(reinterpret_cast<char*>(&nh), 4);
  for (auto& p : done) {
    std::vector<int> hull = quickhull(p.pts);
    // cap vertex count: keep the farthest-from-centroid subset
    if (static_cast<int>(hull.size()) > max_verts) {
      V3 c;
      for (int h : hull) c = c + p.pts[h];
      c = c * (1.0 / hull.size());
      std::sort(hull.begin(), hull.end(), [&](int x, int y) {
        return (p.pts[x] - c).norm() > (p.pts[y] - c).norm();
      });
      hull.resize(max_verts);
    }
    int32_t nv = static_cast<int32_t>(hull.size());
    out.write(reinterpret_cast<char*>(&nv), 4);
    for (int h : hull) {
      float v[3] = {static_cast<float>(p.pts[h].x),
                    static_cast<float>(p.pts[h].y),
                    static_cast<float>(p.pts[h].z)};
      out.write(reinterpret_cast<char*>(v), 12);
    }
  }
  std::printf("vhacd_tool: %d hulls\n", nh);
  return 0;
}
