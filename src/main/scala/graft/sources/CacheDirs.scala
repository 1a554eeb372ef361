package graft.sources

/** Shared derivation of the written-once-per-JVM cache directories the
  * layout sources use (TsLayout / OrcLayout / BlobStore): a sanitized
  * name plus a canonical-path md5 tag, because the sanitized name
  * alone is NOT injective ('data/sf0.1' and 'data_sf0.1' collide).
  * Paths are relative to the working directory (repo root under the
  * driver), never a hardcoded checkout path.
  */
private[sources] object CacheDirs {
  def taggedCacheDir(base: String, dir: String): java.io.File = {
    val canonical = new java.io.File(dir).getCanonicalPath
    val tag = java.security.MessageDigest
      .getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .take(4)
      .map(b => f"$b%02x")
      .mkString
    new java.io.File(base, dir.replaceAll("[^A-Za-z0-9.]", "_") + "_" + tag)
  }
}
