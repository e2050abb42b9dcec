import numpy as np, itertools, sys
from scipy.optimize import least_squares
sys.path.insert(0, '/root/repo')
from universal_differential_equations_tpu.solvers.tableaus import TABLEAUS

tab = TABLEAUS['Vern7']
s = tab.num_stages
A0 = np.zeros((s, s))
for i, row in enumerate(tab.a):
    A0[i, :len(row)] = row
c = np.array(tab.c)
b0 = np.array(tab.b)
bhat0 = b0 - np.array(tab.b_err)

# free entries: strictly-lower-tri A entries that are nonzero in my table
# (keep the zero pattern: column 2 zeros etc.), plus nonzero b/bhat entries.
a_idx = [(i, j) for i in range(1, s) for j in range(i) if A0[i, j] != 0.0 or j == 0]
b_idx = [j for j in range(s) if b0[j] != 0.0]
bh_idx = [j for j in range(s) if bhat0[j] != 0.0]
print(len(a_idx), "A unknowns,", len(b_idx), "b,", len(bh_idx), "bhat")

def gen_trees(n, cache={}):
    if n in cache: return cache[n]
    if n == 1:
        cache[1] = [()]
        return cache[1]
    out = set()
    def partitions(total, maxpart):
        if total == 0:
            yield []
            return
        for p in range(min(total, maxpart), 0, -1):
            for rest in partitions(total - p, p):
                yield [p] + rest
    sub = {k: gen_trees(k) for k in range(1, n)}
    for part in partitions(n - 1, n - 1):
        for combo in itertools.product(*[sub[p] for p in part]):
            out.add(tuple(sorted(combo)))
    cache[n] = sorted(out)
    return cache[n]

def order(t): return 1 + sum(order(ch) for ch in t)
def gamma(t):
    g = order(t)
    for ch in t: g *= gamma(ch)
    return g

trees7 = [t for n in range(1, 8) for t in gen_trees(n)]
trees6 = [t for n in range(1, 7) for t in gen_trees(n)]

def phi_all(A, trees):
    memo = {}
    def phi(t):
        if t in memo: return memo[t]
        v = np.ones(s)
        for ch in t:
            v = v * (A @ phi(ch))
        memo[t] = v
        return v
    return {t: phi(t) for t in trees}

def unpack(x):
    A = np.zeros((s, s))
    k = 0
    for (i, j) in a_idx:
        A[i, j] = x[k]; k += 1
    b = np.zeros(s); bh = np.zeros(s)
    for j in b_idx:
        b[j] = x[k]; k += 1
    for j in bh_idx:
        bh[j] = x[k]; k += 1
    return A, b, bh

def resid(x):
    A, b, bh = unpack(x)
    ph = phi_all(A, trees7)
    r = []
    for t in trees7:
        r.append(b @ ph[t] - 1.0 / gamma(t))
    for t in trees6:
        r.append(bh @ ph[t] - 1.0 / gamma(t))
    r.extend(A.sum(1) - c)   # non-autonomous consistency c_i = sum_j a_ij
    return np.array(r)

x0 = np.concatenate([[A0[i, j] for i, j in a_idx], b0[b_idx], bhat0[bh_idx]])
print("initial residual:", np.abs(resid(x0)).max())
sol = least_squares(resid, x0, xtol=3e-16, ftol=3e-16, gtol=3e-16, method='lm')
print("final residual:", np.abs(resid(sol.x)).max())
print("param shift:", np.abs(sol.x - x0).max())
A, b, bh = unpack(sol.x)
np.set_printoptions(precision=17)
np.save('/tmp/vern7_A.npy', A); np.save('/tmp/vern7_b.npy', b); np.save('/tmp/vern7_bh.npy', bh)
print("b =", repr(b))
print("berr =", repr(b - bh))
