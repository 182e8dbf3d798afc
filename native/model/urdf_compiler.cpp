// Native URDF -> flat articulated-body model compiler.
//
// TPU-era counterpart of Isaac Gym's closed-source C++ URDF importer
// (`gym.load_asset`, called at /root/reference/bez_isaacgym/tasks/
// kick_env.py:302): parses URDF XML, orders the movable joints
// alphabetically (Isaac Gym DOF-order parity), merges fixed subtrees into
// their movable ancestors (mass/COM/inertia composition with the parallel
// axis theorem), and emits the flat arrays the JAX physics step consumes.
// Python bindings in bez_isaacgym_tpu/native/bindings.py; validated against
// the Python reference implementation (models/robot.py) in
// tests/test_native.py.

#include <algorithm>
#include <array>
#include <cctype>
#include <cmath>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal XML pull parser (URDF subset: elements + attributes, no entities).
// ---------------------------------------------------------------------------

struct XmlNode {
    std::string tag;
    std::map<std::string, std::string> attrs;
    std::vector<std::unique_ptr<XmlNode>> children;

    const XmlNode* child(const std::string& t) const {
        for (const auto& c : children)
            if (c->tag == t) return c.get();
        return nullptr;
    }
    std::string attr(const std::string& k, const std::string& dflt = "") const {
        auto it = attrs.find(k);
        return it == attrs.end() ? dflt : it->second;
    }
};

class XmlParser {
  public:
    explicit XmlParser(std::string text) : s_(std::move(text)) {}

    std::unique_ptr<XmlNode> parse() {
        skip_prolog();
        return parse_element();
    }

  private:
    std::string s_;
    size_t i_ = 0;

    void skip_ws() {
        while (i_ < s_.size() && std::isspace(static_cast<unsigned char>(s_[i_])))
            ++i_;
    }

    void skip_prolog() {
        for (;;) {
            skip_ws();
            if (s_.compare(i_, 2, "<?") == 0) {
                i_ = s_.find("?>", i_);
                if (i_ == std::string::npos) return;
                i_ += 2;
            } else if (s_.compare(i_, 4, "<!--") == 0) {
                i_ = s_.find("-->", i_);
                if (i_ == std::string::npos) return;
                i_ += 3;
            } else {
                return;
            }
        }
    }

    std::string parse_name() {
        size_t start = i_;
        while (i_ < s_.size() && (std::isalnum(static_cast<unsigned char>(s_[i_]))
                                  || s_[i_] == '_' || s_[i_] == '-' || s_[i_] == ':'
                                  || s_[i_] == '.'))
            ++i_;
        return s_.substr(start, i_ - start);
    }

    std::unique_ptr<XmlNode> parse_element() {
        skip_ws();
        if (i_ >= s_.size() || s_[i_] != '<') return nullptr;
        ++i_;  // '<'
        auto node = std::make_unique<XmlNode>();
        node->tag = parse_name();
        // attributes
        for (;;) {
            skip_ws();
            if (i_ >= s_.size()) return node;
            if (s_[i_] == '/') {           // self-closing
                i_ += 2;                   // "/>"
                return node;
            }
            if (s_[i_] == '>') {
                ++i_;
                break;
            }
            std::string key = parse_name();
            skip_ws();
            if (i_ < s_.size() && s_[i_] == '=') {
                ++i_;
                skip_ws();
                char quote = s_[i_];
                ++i_;
                size_t start = i_;
                while (i_ < s_.size() && s_[i_] != quote) ++i_;
                node->attrs[key] = s_.substr(start, i_ - start);
                ++i_;
            }
        }
        // children until </tag>
        for (;;) {
            skip_ws();
            if (i_ >= s_.size()) return node;
            if (s_.compare(i_, 4, "<!--") == 0) {
                i_ = s_.find("-->", i_);
                if (i_ == std::string::npos) return node;
                i_ += 3;
                continue;
            }
            if (s_.compare(i_, 2, "</") == 0) {
                i_ = s_.find('>', i_);
                if (i_ != std::string::npos) ++i_;
                return node;
            }
            if (s_[i_] == '<') {
                auto c = parse_element();
                if (c) node->children.push_back(std::move(c));
            } else {
                ++i_;  // text content: skipped
            }
        }
    }
};

// ---------------------------------------------------------------------------
// Small matrix helpers.
// ---------------------------------------------------------------------------

using Vec3 = std::array<double, 3>;
using Mat3 = std::array<double, 9>;

Vec3 parse_vec3(const std::string& s) {
    Vec3 v{0, 0, 0};
    std::istringstream is(s);
    is >> v[0] >> v[1] >> v[2];
    return v;
}

Mat3 eye() { return {1, 0, 0, 0, 1, 0, 0, 0, 1}; }

Mat3 matmul(const Mat3& a, const Mat3& b) {
    Mat3 c{};
    for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j)
            for (int k = 0; k < 3; ++k) c[3 * i + j] += a[3 * i + k] * b[3 * k + j];
    return c;
}

Vec3 matvec(const Mat3& a, const Vec3& v) {
    Vec3 r{};
    for (int i = 0; i < 3; ++i)
        for (int k = 0; k < 3; ++k) r[i] += a[3 * i + k] * v[k];
    return r;
}

Mat3 transpose(const Mat3& a) {
    return {a[0], a[3], a[6], a[1], a[4], a[7], a[2], a[5], a[8]};
}

Vec3 add(const Vec3& a, const Vec3& b) {
    return {a[0] + b[0], a[1] + b[1], a[2] + b[2]};
}

// URDF fixed-axis rpy -> R = Rz(y) Ry(p) Rx(r).
Mat3 rpy_to_matrix(const Vec3& rpy) {
    const double cr = std::cos(rpy[0]), sr = std::sin(rpy[0]);
    const double cp = std::cos(rpy[1]), sp = std::sin(rpy[1]);
    const double cy = std::cos(rpy[2]), sy = std::sin(rpy[2]);
    Mat3 Rx{1, 0, 0, 0, cr, -sr, 0, sr, cr};
    Mat3 Ry{cp, 0, sp, 0, 1, 0, -sp, 0, cp};
    Mat3 Rz{cy, -sy, 0, sy, cy, 0, 0, 0, 1};
    return matmul(Rz, matmul(Ry, Rx));
}

// ---------------------------------------------------------------------------
// URDF model flattening (mirror of models/robot.py::build_robot_model).
// ---------------------------------------------------------------------------

struct Link {
    std::string name;
    double mass = 0.0;
    Vec3 com{0, 0, 0};
    Vec3 com_rpy{0, 0, 0};
    Mat3 inertia{};  // about COM, inertial frame
};

struct Joint {
    std::string name;
    std::string kind;
    std::string parent, child;
    Vec3 xyz{0, 0, 0};
    Vec3 rpy{0, 0, 0};
    Vec3 axis{1, 0, 0};
    double lower = 0, upper = 0, effort = 0, velocity = 0;
};

struct FlatModel {
    int nb = 0, nq = 0;
    std::vector<int> parent;
    std::vector<double> tree_pos;   // nb*3
    std::vector<double> tree_rot;   // nb*9
    std::vector<double> axis;       // nq*3
    std::vector<double> mass;       // nb
    std::vector<double> com;        // nb*3
    std::vector<double> inertia;    // nb*9
    std::vector<double> limits;     // nq*4 (lower, upper, effort, velocity)
    std::string joint_names;        // ';'-separated
    std::string body_names;         // ';'-separated
    std::string error;
};

std::string strip_slash(std::string s) {
    while (!s.empty() && s.front() == '/') s.erase(s.begin());
    return s;
}

FlatModel compile_urdf_text(const std::string& text) {
    FlatModel out;
    XmlParser parser(text);
    auto root = parser.parse();
    if (!root || root->tag != "robot") {
        out.error = "not a URDF <robot> document";
        return out;
    }

    std::vector<Link> links;
    std::vector<Joint> joints;
    for (const auto& c : root->children) {
        if (c->tag == "link") {
            Link l;
            l.name = strip_slash(c->attr("name"));
            if (const XmlNode* in = c->child("inertial")) {
                if (const XmlNode* o = in->child("origin")) {
                    l.com = parse_vec3(o->attr("xyz", "0 0 0"));
                    l.com_rpy = parse_vec3(o->attr("rpy", "0 0 0"));
                }
                if (const XmlNode* m = in->child("mass"))
                    l.mass = std::stod(m->attr("value", "0"));
                if (const XmlNode* ie = in->child("inertia")) {
                    const double ixx = std::stod(ie->attr("ixx", "0"));
                    const double ixy = std::stod(ie->attr("ixy", "0"));
                    const double ixz = std::stod(ie->attr("ixz", "0"));
                    const double iyy = std::stod(ie->attr("iyy", "0"));
                    const double iyz = std::stod(ie->attr("iyz", "0"));
                    const double izz = std::stod(ie->attr("izz", "0"));
                    l.inertia = {ixx, ixy, ixz, ixy, iyy, iyz, ixz, iyz, izz};
                }
            }
            links.push_back(std::move(l));
        } else if (c->tag == "joint") {
            Joint j;
            j.name = strip_slash(c->attr("name"));
            j.kind = c->attr("type", "fixed");
            if (const XmlNode* p = c->child("parent"))
                j.parent = strip_slash(p->attr("link"));
            if (const XmlNode* ch = c->child("child"))
                j.child = strip_slash(ch->attr("link"));
            if (const XmlNode* o = c->child("origin")) {
                j.xyz = parse_vec3(o->attr("xyz", "0 0 0"));
                j.rpy = parse_vec3(o->attr("rpy", "0 0 0"));
            }
            if (const XmlNode* a = c->child("axis"))
                j.axis = parse_vec3(a->attr("xyz", "1 0 0"));
            if (const XmlNode* lim = c->child("limit")) {
                j.lower = std::stod(lim->attr("lower", "0"));
                j.upper = std::stod(lim->attr("upper", "0"));
                j.effort = std::stod(lim->attr("effort", "0"));
                j.velocity = std::stod(lim->attr("velocity", "0"));
            }
            joints.push_back(std::move(j));
        }
    }

    // Root link: the one that is never a child.
    std::map<std::string, const Joint*> joint_by_child;
    for (const auto& j : joints) joint_by_child[j.child] = &j;
    std::string root_link;
    for (const auto& l : links)
        if (!joint_by_child.count(l.name)) root_link = l.name;
    if (root_link.empty()) {
        out.error = "no root link";
        return out;
    }

    // DOF order: alphabetical movable joints (Isaac Gym parity).
    std::vector<const Joint*> movable;
    for (const auto& j : joints)
        if (j.kind == "revolute" || j.kind == "continuous" || j.kind == "prismatic")
            movable.push_back(&j);
    std::sort(movable.begin(), movable.end(),
              [](const Joint* a, const Joint* b) { return a->name < b->name; });

    const int nq = static_cast<int>(movable.size());
    const int nb = nq + 1;
    std::map<std::string, int> body_index;
    std::vector<std::string> body_names{root_link};
    body_index[root_link] = 0;
    for (int d = 0; d < nq; ++d) {
        body_index[movable[d]->child] = d + 1;
        body_names.push_back(movable[d]->child);
    }

    // Walk up fixed joints to the movable ancestor.
    auto movable_ancestor = [&](std::string link, Vec3& pos, Mat3& rot) -> int {
        pos = {0, 0, 0};
        rot = eye();
        while (!body_index.count(link)) {
            auto it = joint_by_child.find(link);
            if (it == joint_by_child.end()) return -1;
            const Joint* j = it->second;
            Mat3 Rj = rpy_to_matrix(j->rpy);
            pos = add(j->xyz, matvec(Rj, pos));
            rot = matmul(Rj, rot);
            link = j->parent;
        }
        return body_index[link];
    };

    out.nb = nb;
    out.nq = nq;
    out.parent.assign(nb, -1);
    out.tree_pos.assign(nb * 3, 0.0);
    out.tree_rot.assign(nb * 9, 0.0);
    for (int b = 0; b < nb; ++b)
        for (int k = 0; k < 3; ++k) out.tree_rot[9 * b + 4 * k] = 1.0;
    out.axis.assign(nq * 3, 0.0);
    out.limits.assign(nq * 4, 0.0);

    for (int d = 0; d < nq; ++d) {
        const Joint* j = movable[d];
        const int b = d + 1;
        Vec3 off;
        Mat3 prot;
        const int pidx = movable_ancestor(j->parent, off, prot);
        out.parent[b] = pidx;
        Vec3 tp = add(off, matvec(prot, j->xyz));
        Mat3 tr = matmul(prot, rpy_to_matrix(j->rpy));
        for (int k = 0; k < 3; ++k) out.tree_pos[3 * b + k] = tp[k];
        for (int k = 0; k < 9; ++k) out.tree_rot[9 * b + k] = tr[k];
        const double n = std::sqrt(j->axis[0] * j->axis[0] + j->axis[1] * j->axis[1]
                                   + j->axis[2] * j->axis[2]);
        for (int k = 0; k < 3; ++k) out.axis[3 * d + k] = j->axis[k] / n;
        out.limits[4 * d + 0] = j->lower;
        out.limits[4 * d + 1] = j->upper;
        out.limits[4 * d + 2] = j->effort;
        out.limits[4 * d + 3] = j->velocity;
    }

    // Merge fixed-subtree mass properties into movable bodies.
    struct Entry {
        double m;
        Vec3 c;
        Mat3 I;
    };
    std::vector<std::vector<Entry>> entries(nb);
    for (const auto& l : links) {
        Vec3 off;
        Mat3 rot;
        const int b = movable_ancestor(l.name, off, rot);
        if (b < 0) continue;
        bool has_inertia = l.mass > 0.0;
        for (double v : l.inertia) has_inertia = has_inertia || v != 0.0;
        if (!has_inertia) continue;
        Mat3 R_in = matmul(rot, rpy_to_matrix(l.com_rpy));
        Vec3 c_in = add(off, matvec(rot, l.com));
        Mat3 I_in = matmul(R_in, matmul(l.inertia, transpose(R_in)));
        entries[b].push_back({l.mass, c_in, I_in});
    }

    out.mass.assign(nb, 0.0);
    out.com.assign(nb * 3, 0.0);
    out.inertia.assign(nb * 9, 0.0);
    for (int b = 0; b < nb; ++b) {
        double m_tot = 0.0;
        for (const auto& e : entries[b]) m_tot += e.m;
        if (m_tot <= 0.0) continue;
        Vec3 com{0, 0, 0};
        for (const auto& e : entries[b])
            for (int k = 0; k < 3; ++k) com[k] += e.m * e.c[k];
        for (int k = 0; k < 3; ++k) com[k] /= m_tot;
        Mat3 I{};
        for (const auto& e : entries[b]) {
            Vec3 d{e.c[0] - com[0], e.c[1] - com[1], e.c[2] - com[2]};
            const double dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
            for (int r = 0; r < 3; ++r)
                for (int cc = 0; cc < 3; ++cc) {
                    I[3 * r + cc] += e.I[3 * r + cc]
                        + e.m * ((r == cc ? dd : 0.0) - d[r] * d[cc]);
                }
        }
        out.mass[b] = m_tot;
        for (int k = 0; k < 3; ++k) out.com[3 * b + k] = com[k];
        for (int k = 0; k < 9; ++k) out.inertia[9 * b + k] = I[k];
    }

    for (int d = 0; d < nq; ++d) {
        out.joint_names += movable[d]->name;
        if (d + 1 < nq) out.joint_names += ";";
    }
    for (int b = 0; b < nb; ++b) {
        out.body_names += body_names[b];
        if (b + 1 < nb) out.body_names += ";";
    }
    return out;
}

FlatModel* g_last = nullptr;

}  // namespace

extern "C" {

// Compile a URDF file. Returns nb (>0) on success, -1 on error.
// Results are fetched with the bez_model_get_* accessors below.
int bez_compile_urdf(const char* path) {
    std::ifstream f(path);
    if (!f) return -1;
    std::stringstream ss;
    ss << f.rdbuf();
    delete g_last;
    g_last = new FlatModel(compile_urdf_text(ss.str()));
    if (!g_last->error.empty()) return -1;
    return g_last->nb;
}

int bez_model_nq() { return g_last ? g_last->nq : -1; }

#define COPY_FIELD(name, count_expr)                                   \
    int bez_model_##name(double* out) {                                \
        if (!g_last) return -1;                                        \
        std::memcpy(out, g_last->name.data(),                          \
                    (count_expr) * sizeof(double));                    \
        return static_cast<int>(count_expr);                           \
    }

COPY_FIELD(tree_pos, g_last->nb * 3)
COPY_FIELD(tree_rot, g_last->nb * 9)
COPY_FIELD(axis, g_last->nq * 3)
COPY_FIELD(mass, g_last->nb)
COPY_FIELD(com, g_last->nb * 3)
COPY_FIELD(inertia, g_last->nb * 9)
COPY_FIELD(limits, g_last->nq * 4)

int bez_model_parent(int* out) {
    if (!g_last) return -1;
    std::memcpy(out, g_last->parent.data(), g_last->nb * sizeof(int));
    return g_last->nb;
}

// Copies the ';'-separated names into buf (truncated to buflen-1).
int bez_model_joint_names(char* buf, int buflen) {
    if (!g_last) return -1;
    std::strncpy(buf, g_last->joint_names.c_str(), buflen - 1);
    buf[buflen - 1] = '\0';
    return static_cast<int>(g_last->joint_names.size());
}

int bez_model_body_names(char* buf, int buflen) {
    if (!g_last) return -1;
    std::strncpy(buf, g_last->body_names.c_str(), buflen - 1);
    buf[buflen - 1] = '\0';
    return static_cast<int>(g_last->body_names.size());
}

}  // extern "C"
