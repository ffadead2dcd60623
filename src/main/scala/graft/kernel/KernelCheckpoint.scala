package graft.kernel

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Model checkpoint sink (SURVEY.md §2.33) — the engine-side counterpart
  * of the reference's per-epoch `torch.save` + best/resume bookkeeping
  * (`sem_eval_model.py` checkpoint_dir handling): one artifact file per
  * epoch in [[ArtifactKernel]]'s versioned binary format, plus a
  * `MANIFEST` naming the latest epoch, written atomically LAST so a crash
  * between files never yields a manifest that points at a missing or
  * half-written artifact (the same commit-ordering discipline as the
  * engine's stage checkpoints, `io.Checkpoint`). */
object KernelCheckpoint {

  private def artifactName(epoch: Int) = f"kernel_epoch_$epoch%05d.bin"

  /** Write the epoch's artifact, then commit it in the manifest. */
  def save(k: ArtifactKernel, dir: Path, epoch: Int): Path = {
    Files.createDirectories(dir)
    val art = dir.resolve(artifactName(epoch))
    ArtifactKernel.write(k, art)
    val tmp = dir.resolve("MANIFEST.tmp")
    Files.writeString(tmp, s"$epoch\n${artifactName(epoch)}\n", StandardCharsets.UTF_8)
    Files.move(tmp, dir.resolve("MANIFEST"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    art
  }

  /** Resume: latest committed epoch and its kernel, None when no
    * checkpoint was ever committed. */
  def loadLatest(dir: Path): Option[(Int, ArtifactKernel)] = {
    val manifest = dir.resolve("MANIFEST")
    if (!Files.exists(manifest)) return None
    val lines = Files.readString(manifest, StandardCharsets.UTF_8).linesIterator.toSeq
    val epoch = lines.head.trim.toInt
    Some((epoch, ArtifactKernel.load(dir.resolve(lines(1).trim))))
  }
}
