package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level tag for the SLOW tier (aging / stream / crash-protocol
 * suites). The default `sbt test` excludes it (`-l graft.Slow`) so the
 * driver's budgeted test run finishes with a verdict; the builder runs
 * the full set with the `slowTests` alias (round 14, VERDICT #7).
 */
@TagAnnotation
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.METHOD, ElementType.TYPE})
public @interface Slow {}
