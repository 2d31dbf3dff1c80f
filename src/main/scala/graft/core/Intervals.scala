package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Interval algebra as pure Column combinators.
  *
  * Re-expresses the reference's interval operations (pygr
  * `sequence.py:405-505` — `__contains__`, `overlaps`, `__mul__`
  * intersection, `__add__` union-span, before/after) and the affine
  * `IntervalTransform` (`sequence.py:26-132`) as codegen-friendly
  * expressions. All intervals are half-open `[start, end)` on a Long
  * axis; orientation is an explicit `ori` column (+1/-1), NOT pygr's
  * sign-encoded coordinates (see SURVEY.md §7.4).
  */
object Intervals {

  /** True when [s1,e1) and [s2,e2) overlap (pygr `sequence.py:416-424`). */
  def overlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s1 < e2 && s2 < e1

  /** True when point p falls inside [s,e) (pygr `sequence.py:405-414`). */
  def containsPoint(s: Column, e: Column, p: Column): Column =
    p >= s && p < e

  /** True when [s2,e2) is fully inside [s1,e1). */
  def containsIval(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s2 >= s1 && e2 <= e1

  /** Intersection length, 0 when disjoint (pygr `__mul__`). */
  def intersectLen(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    greatest(least(e1, e2) - greatest(s1, s2), lit(0L))

  /** Union span length (pygr `__add__` bounding interval). */
  def spanLen(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    greatest(e1, e2) - least(s1, s2)

  /** Clip [s,e) to window [ws,we); may produce empty (start>=end). */
  def clipStart(s: Column, ws: Column): Column = greatest(s, ws)
  def clipEnd(e: Column, we: Column): Column = least(e, we)

  /** Affine interval transform (pygr `IntervalTransform.xform`,
    * `sequence.py:47-53`): map x on the src axis to the dest axis.
    */
  def xform(x: Column, srcStart: Column, destStart: Column, scale: Column): Column =
    destStart + (x - srcStart) * scale

  /** Dest-coordinate adjustment when the src interval of an ungapped
    * 1:1 block is clipped to [newS,newE). Orientation-aware: for
    * ori=-1 the dest axis runs opposite the src axis (pygr encodes
    * this with negative coords, `sequence.py:229-236`).
    */
  def clipDestStart(srcS: Column, srcE: Column, newS: Column, newE: Column,
                    destS: Column, ori: Column): Column =
    when(ori >= 0, destS + (newS - srcS)).otherwise(destS + (srcE - newE))

  def clipDestEnd(srcS: Column, srcE: Column, newS: Column, newE: Column,
                  destE: Column, ori: Column): Column =
    when(ori >= 0, destE - (srcE - newE)).otherwise(destE - (newS - srcS))
}
