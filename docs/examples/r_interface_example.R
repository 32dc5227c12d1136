# Runnable reticulate example (reference pyGEMMA.html:355-385).
# Verified by tests/test_extras.py::test_r_interface_example when
# Rscript + reticulate are installed; prints "R_INTERFACE_OK" on success.
library(reticulate)

pygemma_tpu <- import("pygemma_tpu")
np <- import("numpy")

set.seed(7)
n <- 80; p <- 12
X <- matrix(rbinom(n * p, 2, 0.3), n, p)
X <- scale(X)
colnames(X) <- paste0("rs", seq_len(p))
y <- 0.6 * X[, 1] + rnorm(n)
W <- cbind(1, rnorm(n))
K <- tcrossprod(X) / p + diag(1e-3, n)

res <- pygemma_tpu$pygemma(
  Y = as.matrix(y), X = X, W = W, K = K, snps = colnames(X)
)
stopifnot(nrow(res) == p)
stopifnot(all(c("beta", "se_beta", "tau", "lambda", "F_wald", "p_wald",
                "SNPs") %in% colnames(res)))
stopifnot(all(is.finite(res$p_wald)))
# the causal SNP should be the top hit in this easy setting
stopifnot(which.min(res$p_wald) == 1)

# LRT + score extension and the plotting module load the same way
res2 <- pygemma_tpu$pygemma(Y = as.matrix(y), X = X, W = W, K = K,
                            tests = c("wald", "score"))
stopifnot("p_score" %in% colnames(res2))

cat("R_INTERFACE_OK\n")
