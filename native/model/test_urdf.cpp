// Unit tests for the native URDF compiler against a tiny synthetic robot.

#include <cstdio>
#include <fstream>

#include "../minitest.hpp"

extern "C" {
int bez_compile_urdf(const char* path);
int bez_model_nq();
int bez_model_parent(int* out);
int bez_model_mass(double* out);
int bez_model_com(double* out);
int bez_model_axis(double* out);
int bez_model_limits(double* out);
int bez_model_tree_pos(double* out);
int bez_model_joint_names(char* buf, int buflen);
}

static const char* kUrdf = R"(<?xml version="1.0"?>
<robot name="mini">
  <link name="base">
    <inertial>
      <origin xyz="0 0 0.1"/>
      <mass value="2.0"/>
      <inertia ixx="0.1" ixy="0" ixz="0" iyy="0.1" iyz="0" izz="0.1"/>
    </inertial>
  </link>
  <link name="arm">
    <inertial>
      <origin xyz="0 0 -0.2"/>
      <mass value="0.5"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/>
    </inertial>
  </link>
  <link name="tip">
    <inertial>
      <origin xyz="0 0 0"/>
      <mass value="0.25"/>
      <inertia ixx="0.001" ixy="0" ixz="0" iyy="0.001" iyz="0" izz="0.001"/>
    </inertial>
  </link>
  <joint name="a_shoulder" type="revolute">
    <parent link="base"/>
    <child link="arm"/>
    <origin xyz="0 0.1 0.3"/>
    <axis xyz="0 -1 0"/>
    <limit lower="-1.5" upper="1.5" effort="2.5" velocity="6.28"/>
  </joint>
  <joint name="z_tip_fix" type="fixed">
    <parent link="arm"/>
    <child link="tip"/>
    <origin xyz="0 0 -0.4"/>
  </joint>
</robot>
)";

TEST(Urdf, CompileMini) {
    const char* path = "/tmp/mini_test.urdf";
    {
        std::ofstream f(path);
        f << kUrdf;
    }
    int nb = bez_compile_urdf(path);
    ASSERT_EQ(2, nb);            // base + arm (tip is fixed, merged)
    ASSERT_EQ(1, bez_model_nq());

    int parent[8];
    bez_model_parent(parent);
    ASSERT_EQ(-1, parent[0]);
    ASSERT_EQ(0, parent[1]);

    double mass[8];
    bez_model_mass(mass);
    ASSERT_NEAR(2.0, mass[0], 1e-12);
    ASSERT_NEAR(0.75, mass[1], 1e-12);  // arm 0.5 + merged tip 0.25

    // Combined COM of arm(0,0,-0.2)*0.5 + tip(0,0,-0.4)*0.25 = (0,0,-4/15).
    double com[8 * 3];
    bez_model_com(com);
    ASSERT_NEAR(-0.2666666667, com[3 + 2], 1e-9);

    double axis[4 * 3];
    bez_model_axis(axis);
    ASSERT_NEAR(-1.0, axis[1], 1e-12);

    double limits[4 * 4];
    bez_model_limits(limits);
    ASSERT_NEAR(-1.5, limits[0], 1e-12);
    ASSERT_NEAR(2.5, limits[2], 1e-12);

    double tp[8 * 3];
    bez_model_tree_pos(tp);
    ASSERT_NEAR(0.1, tp[3 + 1], 1e-12);
    ASSERT_NEAR(0.3, tp[3 + 2], 1e-12);

    char names[256];
    bez_model_joint_names(names, sizeof(names));
    ASSERT_TRUE(std::string(names) == "a_shoulder");
}

int main() { return RUN_ALL_TESTS(); }
